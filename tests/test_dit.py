"""DiT denoiser: forward numerics, bf16 discipline, tensor-parallel
shardings, and GPipe pipeline parallelism (bit-equality vs the
single-program scan, grads through the pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sonar_tpu.models import (
    DiTConfig,
    dit_apply,
    dit_param_shardings,
    dit_pp_apply,
    init_dit_params,
    make_dit_denoiser,
    pp_stage_params,
)
from sonar_tpu.parallel import make_mesh

CFG = DiTConfig(hidden=64, depth=4, num_heads=4, patch_size=2)


@pytest.fixture(scope="module")
def params():
    return init_dit_params(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 4, 16, 16)),
        jnp.float32)


def test_forward_shape_and_finite(params, x):
    sigma = jnp.full((4,), 3.0)
    eps = jax.jit(lambda p, v, s: dit_apply(p, v, s, CFG))(params, x, sigma)
    assert eps.shape == x.shape and eps.dtype == x.dtype
    assert bool(jnp.isfinite(eps).all())
    # non-degenerate: output responds to sigma
    eps2 = dit_apply(params, x, jnp.full((4,), 0.1), CFG)
    assert not np.allclose(np.asarray(eps), np.asarray(eps2))


def test_bf16_compute_keeps_input_dtype_and_f32_conditioning():
    cfg = DiTConfig(hidden=64, depth=2, num_heads=4, dtype=jnp.bfloat16)
    p = init_dit_params(jax.random.key(1), cfg)
    xb = jnp.ones((2, 4, 8, 8), jnp.float32)
    out = dit_apply(p, xb, jnp.full((2,), 5.0), cfg)
    assert out.dtype == jnp.float32  # cast back to the latent dtype
    assert bool(jnp.isfinite(out).all())
    # the sigma embedding's angles must be f32 even under bf16 compute:
    # two sigmas a bf16 angle-step apart still give distinct embeddings
    from sonar_tpu.models.dit import _sigma_embedding

    e1 = _sigma_embedding(jnp.asarray([10.0]), 64, jnp.bfloat16)
    e2 = _sigma_embedding(jnp.asarray([10.05]), 64, jnp.bfloat16)
    assert not np.array_equal(np.asarray(e1), np.asarray(e2))


def test_denoiser_protocol(params, x):
    model = make_dit_denoiser(params, CFG)
    den = model(x, jnp.asarray(2.0))
    assert den.shape == x.shape
    # weights as a call-time argument (the jit-argument contract)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    den0 = model(x, jnp.asarray(2.0), params=zeroed)
    assert not np.allclose(np.asarray(den), np.asarray(den0))


def test_pp_stage_params_layout(params):
    staged = pp_stage_params(params, 2)
    lead = jax.tree_util.tree_leaves(staged["blocks"])[0].shape[:2]
    assert lead == (2, CFG.depth // 2)
    with pytest.raises(ValueError):
        pp_stage_params(params, 3)


def test_pp_forward_bit_equal_and_grads(params, x):
    """The GPipe schedule must reproduce the single-program scan (up to
    fusion-order ulps) and jax.grad through it is pipeline-parallel
    backprop."""
    mesh = make_mesh(4, axis_names=("pp",))
    sigma = jnp.full((4,), 3.0)
    ref = dit_apply(params, x, sigma, CFG)

    staged = pp_stage_params(params, 4)
    sh = dit_param_shardings(staged, mesh, tp=None, pp="pp")
    staged = jax.tree_util.tree_map(jax.device_put, staged, sh)

    out = jax.jit(lambda p, v, s: dit_pp_apply(
        p, v, s, CFG, mesh, microbatches=2, dp=None))(staged, x, sigma)
    # fusion-order ulps only: the shard_map program compiles differently
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    def loss(p, v, s):
        return jnp.sum(dit_pp_apply(p, v, s, CFG, mesh,
                                    microbatches=2, dp=None) ** 2)

    def loss_ref(p, v, s):
        return jnp.sum(dit_apply(p, v, s, CFG) ** 2)

    g_pp = jax.jit(jax.grad(loss))(staged, x, sigma)
    g_ref = jax.grad(loss_ref)(params, x, sigma)
    g_ref_staged = pp_stage_params(g_ref, 4)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ref_staged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_pp_composes_with_dp(params):
    """dp×pp: batch sharded over dp while the block stack pipelines."""
    mesh = make_mesh(8, axis_names=("dp", "pp"), mesh_shape=(2, 4))
    xb = jnp.asarray(np.random.default_rng(1).standard_normal((8, 4, 16, 16)),
                     jnp.float32)
    sigma = jnp.full((8,), 1.5)
    ref = dit_apply(params, xb, sigma, CFG)

    staged = pp_stage_params(params, 4)
    staged = jax.tree_util.tree_map(
        jax.device_put, staged, dit_param_shardings(staged, mesh,
                                                    tp=None, pp="pp"))
    xs = jax.device_put(xb, NamedSharding(mesh, P("dp")))
    out = jax.jit(lambda p, v, s: dit_pp_apply(
        p, v, s, CFG, mesh, microbatches=2, pp="pp", dp="dp"))(
            staged, xs, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_tp_sharded_forward_matches(params, x):
    """Megatron-style tp shardings change the layout, not the math."""
    mesh = make_mesh(8, axis_names=("dp", "tp"), mesh_shape=(2, 4))
    ref = dit_apply(params, x, jnp.full((4,), 3.0), CFG)
    sh = dit_param_shardings(params, mesh, tp="tp")
    # qkv kernels split output features on tp; attn_out splits input
    assert sh["blocks"]["qkv"]["w"].spec == P(None, None, "tp")
    assert sh["blocks"]["attn_out"]["w"].spec == P(None, "tp", None)
    pt = jax.tree_util.tree_map(jax.device_put, params, sh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    out = jax.jit(lambda p, v, s: dit_apply(p, v, s, CFG))(
        pt, xs, jnp.full((4,), 3.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dit_drives_the_sampler(params):
    """The DiT denoiser satisfies the sampler protocol end to end."""
    from sonar_tpu.api import SonarPipeline

    pipe = SonarPipeline(model=make_dit_denoiser(params, CFG),
                         sampler="sonar_euler_ancestral", seed=0)
    sig = np.concatenate([np.geomspace(14.6, 0.03, 6), [0.0]]).astype(
        np.float32)
    x0 = jnp.asarray(np.random.default_rng(2)
                     .standard_normal((2, 4, 16, 16)).astype(np.float32)) * 14.6
    out = pipe(x0, sig)
    assert out.shape == x0.shape and bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# Mixture of experts (Switch-style top-1, einsum dispatch, ep sharding)
# ---------------------------------------------------------------------------

MOE_CFG = DiTConfig(hidden=64, depth=2, num_heads=4, patch_size=2,
                    num_experts=4, capacity_factor=4.0)


@pytest.fixture(scope="module")
def moe_params():
    return init_dit_params(jax.random.key(3), MOE_CFG)


def test_moe_forward_and_aux(moe_params, x):
    sigma = jnp.full((4,), 3.0)
    eps, aux = jax.jit(lambda p, v, s: dit_apply(p, v, s, MOE_CFG,
                                                 return_aux=True))(
        moe_params, x, sigma)
    assert eps.shape == x.shape and bool(jnp.isfinite(eps).all())
    # Switch load-balance loss: E·Σf_e·P_e ≥ 1, = 1 when perfectly balanced
    assert float(aux) >= 1.0 - 1e-5, float(aux)
    # experts are actually consulted: zeroing them changes the output
    zeroed = dict(moe_params, blocks=dict(
        moe_params["blocks"],
        mlp_out={"w": jnp.zeros_like(moe_params["blocks"]["mlp_out"]["w"]),
                 "b": jnp.zeros_like(moe_params["blocks"]["mlp_out"]["b"])}))
    eps0 = dit_apply(zeroed, x, sigma, MOE_CFG)
    assert not np.allclose(np.asarray(eps), np.asarray(eps0))


def test_moe_matches_naive_routing():
    """The einsum dispatch/combine must equal per-token gather routing
    (capacity large enough that nothing drops)."""
    from sonar_tpu.models.dit import _moe_mlp

    cfg = DiTConfig(hidden=16, num_experts=4, capacity_factor=4.0)
    key = jax.random.key(5)
    p = {
        "router": {"w": jax.random.normal(key, (16, 4)) * 0.5,
                   "b": jnp.zeros((4,))},
        "mlp_in": {"w": jax.random.normal(jax.random.fold_in(key, 1),
                                          (4, 16, 32)) * 0.2,
                   "b": jnp.zeros((4, 32))},
        "mlp_out": {"w": jax.random.normal(jax.random.fold_in(key, 2),
                                           (4, 32, 16)) * 0.2,
                    "b": jnp.zeros((4, 16))},
    }
    xt = jax.random.normal(jax.random.fold_in(key, 3), (2, 6, 16))
    got, _ = _moe_mlp(p, xt, cfg)

    logits = xt @ p["router"]["w"] + p["router"]["b"]
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    idx = np.asarray(jnp.argmax(probs, -1))
    gate = np.asarray(jnp.max(probs, -1))
    want = np.zeros((2, 6, 16), np.float32)
    for b in range(2):
        for t in range(6):
            e = idx[b, t]
            hmid = np.asarray(jax.nn.gelu(
                xt[b, t] @ p["mlp_in"]["w"][e] + p["mlp_in"]["b"][e]))
            want[b, t] = gate[b, t] * np.asarray(
                hmid @ p["mlp_out"]["w"][e] + p["mlp_out"]["b"][e])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_moe_capacity_drops_tokens():
    """Beyond-capacity tokens contribute nothing (residual-only)."""
    from sonar_tpu.models.dit import _moe_mlp

    cfg = DiTConfig(hidden=8, num_experts=2, capacity_factor=1e-9)  # C=1
    key = jax.random.key(6)
    p = {
        # bias forces every token to expert 0 → only the first token kept
        "router": {"w": jnp.zeros((8, 2)),
                   "b": jnp.asarray([5.0, -5.0])},
        "mlp_in": {"w": jnp.ones((2, 8, 8)) * 0.1, "b": jnp.zeros((2, 8))},
        "mlp_out": {"w": jnp.ones((2, 8, 8)) * 0.1, "b": jnp.zeros((2, 8))},
    }
    xt = jax.random.normal(key, (1, 4, 8))
    y, _ = _moe_mlp(p, xt, cfg)
    assert not np.allclose(np.asarray(y[0, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(y[0, 1:]), 0.0)


def test_moe_ep_sharded_matches(moe_params, x):
    """Expert-parallel layout changes collectives, not math."""
    mesh = make_mesh(8, axis_names=("dp", "ep"), mesh_shape=(2, 4))
    sigma = jnp.full((4,), 3.0)
    ref = dit_apply(moe_params, x, sigma, MOE_CFG)
    sh = dit_param_shardings(moe_params, mesh, tp=None, ep="ep")
    assert sh["blocks"]["mlp_in"]["w"].spec == P(None, "ep", None, None)
    pt = jax.tree_util.tree_map(jax.device_put, moe_params, sh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    out = jax.jit(lambda p, v, s: dit_apply(p, v, s, MOE_CFG))(pt, xs, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_moe_pp_composes(moe_params, x):
    """MoE blocks pipeline too; eps matches the single-program scan.
    (The pp aux is the per-microbatch formulation — standard for pipelined
    MoE — so only eps equality is asserted.)"""
    mesh = make_mesh(2, axis_names=("pp",))
    sigma = jnp.full((4,), 3.0)
    ref = dit_apply(moe_params, x, sigma, MOE_CFG)
    staged = pp_stage_params(moe_params, 2)
    staged = jax.tree_util.tree_map(
        jax.device_put, staged,
        dit_param_shardings(staged, mesh, tp=None, pp="pp", ep=None))
    out, aux = jax.jit(lambda p, v, s: dit_pp_apply(
        p, v, s, MOE_CFG, mesh, microbatches=2, dp=None,
        return_aux=True))(staged, x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert float(aux) >= 1.0 - 1e-5


# ---------------------------------------------------------------------------
# Review-wave regressions
# ---------------------------------------------------------------------------

def test_pp_stage_count_must_match_mesh(params):
    """Staging for S stages but running on a different-size pp mesh must
    raise — the local view would silently drop blocks (verified: ~17%
    output error with non-degenerate weights, masked by adaLN-zero init)."""
    mesh = make_mesh(2, axis_names=("pp",))
    staged4 = pp_stage_params(params, 4)
    with pytest.raises(ValueError, match="stage axis"):
        dit_pp_apply(staged4, jnp.zeros((2, 4, 16, 16)), jnp.ones((2,)),
                     CFG, mesh, microbatches=1, dp=None)
    # an UNSTAGED tree gets the same clear error, not a scan shape crash
    with pytest.raises(ValueError, match="stage axis"):
        dit_pp_apply(params, jnp.zeros((2, 4, 16, 16)), jnp.ones((2,)),
                     CFG, mesh, microbatches=1, dp=None)


def test_pp_microbatch_check_uses_local_batch(params):
    """b=8 over dp=2 is 4 rows per shard: microbatches=8 must raise the
    intended ValueError, not a reshape crash inside shard_map."""
    mesh = make_mesh(8, axis_names=("dp", "pp"), mesh_shape=(2, 4))
    staged = pp_stage_params(params, 4)
    with pytest.raises(ValueError, match="per-shard batch 4"):
        dit_pp_apply(staged, jnp.zeros((8, 4, 16, 16)), jnp.ones((8,)),
                     CFG, mesh, microbatches=8)


def test_pp_refuses_ep_or_tp_sharded_blocks(moe_params):
    """pp composes with dp only: an ep-sharded staged tree must be refused
    loudly instead of silently all-gathered to full replication."""
    mesh = make_mesh(8, axis_names=("ep", "pp"), mesh_shape=(4, 2))
    staged = pp_stage_params(moe_params, 2)
    staged = jax.tree_util.tree_map(
        jax.device_put, staged,
        dit_param_shardings(staged, mesh, tp=None, pp="pp", ep="ep"))
    with pytest.raises(NotImplementedError, match="dp only"):
        dit_pp_apply(staged, jnp.zeros((4, 4, 16, 16)), jnp.ones((4,)),
                     MOE_CFG, mesh, microbatches=2, dp=None)


def test_tp_attention_compiles_gather_free(params, x):
    """The head-major packed qkv layout must keep attention sharded: the
    tp forward compiles with ZERO all-gathers (a head-misaligned split
    forces GSPMD to gather q/k/v to full width — the round-3 review
    finding, verified 5 all-gathers with the old (3, heads, dh) order)."""
    mesh = make_mesh(8, axis_names=("dp", "tp"), mesh_shape=(2, 4))
    pt = jax.tree_util.tree_map(
        jax.device_put, params, dit_param_shardings(params, mesh, tp="tp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    hlo = (jax.jit(lambda p, v, s: dit_apply(p, v, s, CFG))
           .lower(pt, xs, jnp.full((4,), 3.0)).compile().as_text())
    n_gather = sum("all-gather" in ln for ln in hlo.splitlines())
    n_reduce = sum("all-reduce" in ln for ln in hlo.splitlines())
    assert n_gather == 0, f"attention tp leaks {n_gather} all-gathers"
    assert n_reduce > 0  # the megatron psums are really there


def test_pp_denoiser_serves_sampling(params):
    """A pp-pipelined DiT denoiser drives the full sampler: the whole
    sampling loop compiles as one program with the GPipe schedule nested
    in each step, matching the single-device pipeline bit-for-bit in
    trajectory shape and closely in values."""
    from sonar_tpu.api import SonarPipeline

    mesh = make_mesh(4, axis_names=("pp",))
    staged = pp_stage_params(params, 4)
    staged = jax.tree_util.tree_map(
        jax.device_put, staged,
        dit_param_shardings(staged, mesh, tp=None, pp="pp"))
    sig = np.concatenate([np.geomspace(14.6, 0.03, 5), [0.0]]).astype(
        np.float32)
    x0 = jnp.asarray(np.random.default_rng(3)
                     .standard_normal((2, 4, 16, 16)).astype(np.float32)) * 14.6

    plain = SonarPipeline(model=make_dit_denoiser(params, CFG),
                          sampler="sonar_euler_ancestral", seed=1)
    piped = SonarPipeline(
        model=make_dit_denoiser(staged, CFG, pp_mesh=mesh,
                                microbatches=2, dp=None),
        sampler="sonar_euler_ancestral", seed=1)
    ref = plain(x0, sig)
    out = piped(x0, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pp_tp_forward_matches_and_gather_free(params, x):
    """dp×tp×pp (VERDICT r3 item 8): megatron tp inside each pipeline
    stage via manual collectives. Must match plain dit_apply, and the
    compiled pipe must stay all-gather-free (head-major qkv shards are
    whole heads; the only collectives are the per-sublayer psums and the
    ppermute handoffs)."""
    mesh = make_mesh(8, axis_names=("dp", "tp", "pp"), mesh_shape=(2, 2, 2))
    sigma = jnp.full((4,), 3.0)
    ref = dit_apply(params, x, sigma, CFG)

    staged = pp_stage_params(params, 2)
    sh = dit_param_shardings(staged, mesh, tp="tp", pp="pp")
    staged = jax.tree_util.tree_map(jax.device_put, staged, sh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    fn = jax.jit(lambda p, v, s: dit_pp_apply(
        p, v, s, CFG, mesh, microbatches=2, pp="pp", dp="dp", tp="tp"))
    out = fn(staged, xs, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    hlo = fn.lower(staged, xs, sigma).compile().as_text()
    n_gather = sum("all-gather" in ln for ln in hlo.splitlines())
    assert n_gather == 0, f"pp×tp leaks {n_gather} all-gathers"


def test_pp_tp_grads_match(params, x):
    """grad through the tp-inside-pp pipeline is pipeline-parallel
    backprop with tp-sharded stage grads — values must equal the
    single-program reference."""
    mesh = make_mesh(8, axis_names=("dp", "tp", "pp"), mesh_shape=(2, 2, 2))
    sigma = jnp.full((4,), 3.0)
    staged = pp_stage_params(params, 2)
    sh = dit_param_shardings(staged, mesh, tp="tp", pp="pp")
    staged_p = jax.tree_util.tree_map(jax.device_put, staged, sh)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    def loss(p, v, s):
        return jnp.sum(dit_pp_apply(p, v, s, CFG, mesh, microbatches=2,
                                    pp="pp", dp="dp", tp="tp") ** 2)

    def loss_ref(p, v, s):
        return jnp.sum(dit_apply(p, v, s, CFG) ** 2)

    g = jax.jit(jax.grad(loss))(staged_p, xs, sigma)
    g_ref = pp_stage_params(jax.grad(loss_ref)(params, x, sigma), 2)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_pp_tp_refuses_moe_and_bad_heads(moe_params, params):
    mesh = make_mesh(8, axis_names=("tp", "pp"), mesh_shape=(4, 2))
    staged_moe = pp_stage_params(moe_params, 2)
    with pytest.raises(NotImplementedError, match="dense-MLP"):
        dit_pp_apply(staged_moe, jnp.zeros((2, 4, 16, 16)), jnp.ones((2,)),
                     MOE_CFG, mesh, microbatches=1, dp=None, tp="tp")
    staged = pp_stage_params(params, 2)
    cfg3 = DiTConfig(hidden=66, depth=4, num_heads=3, patch_size=2)
    p3 = pp_stage_params(init_dit_params(jax.random.key(1), cfg3), 2)
    with pytest.raises(ValueError, match="not divisible by tp"):
        dit_pp_apply(p3, jnp.zeros((2, 4, 16, 16)), jnp.ones((2,)),
                     cfg3, mesh, microbatches=1, dp=None, tp="tp")


def test_flash_attention_gate(monkeypatch):
    """The pallas flash path only engages on TPU in the dense-logits
    collapse regime (ANALYSIS §19); env forces both directions."""
    from sonar_tpu.models.dit import _use_flash_attention

    # this suite runs on the CPU backend -> auto gate must stay off even
    # at the b8/n=1024 serving shape that triggers it on chip
    monkeypatch.delenv("SONAR_TPU_DIT_FLASH", raising=False)
    assert not _use_flash_attention(8, 6, 1024)
    monkeypatch.setenv("SONAR_TPU_DIT_FLASH", "1")
    assert _use_flash_attention(1, 1, 64)
    monkeypatch.setenv("SONAR_TPU_DIT_FLASH", "0")
    assert not _use_flash_attention(8, 6, 1024)
