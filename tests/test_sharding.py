"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY §4e):
dp-sharded sampling, sp (frame-axis) sharding for 5D video latents, and
tp-sharded UNet params through a training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sonar_tpu.noise import NoiseChain, get_noise_item, make_noise_sampler
from sonar_tpu.parallel import latent_spec, make_mesh, shard_latent, shard_unet_params
from sonar_tpu.samplers.sonar import sample_sonar_euler_ancestral


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8, axis_names=("dp", "tp"))


def test_mesh_factoring(mesh8):
    assert mesh8.shape["dp"] * mesh8.shape["tp"] == 8
    m1 = make_mesh(1)
    assert m1.shape["dp"] == 1


def test_dp_sharded_sampling(mesh8):
    dp = mesh8.shape["dp"]
    x = shard_latent(
        jnp.asarray(np.random.default_rng(0).standard_normal((dp * 2, 4, 8, 8)),
                    jnp.float32) * 14.6,
        mesh8)

    def model(xi, sigma, **kw):
        return xi * 0.9

    sigmas = jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32)
    noise = NoiseChain([get_noise_item("gaussian"), get_noise_item("pyramid")])
    with mesh8:
        out = jax.jit(
            lambda v: sample_sonar_euler_ancestral(model, v, sigmas,
                                                   noise_item=noise, seed=0)
        )(x)
    jax.block_until_ready(out)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sp_frame_sharded_5d_noise():
    """16-frame video latent with the frame axis sharded over 'sp'
    (BASELINE config 5 shape family; SURVEY §5.7)."""
    mesh = make_mesh(8, axis_names=("dp", "sp"), mesh_shape=(1, 8))
    shape = (1, 4, 16, 16, 16)  # (B, C, F, H, W)
    x = jax.device_put(
        jnp.zeros(shape, jnp.float32),
        NamedSharding(mesh, latent_spec(5, sp="sp")))
    item = get_noise_item("pyramid")  # 2D-spatial algo via frames→channels fold
    fn, state = make_noise_sampler(item, shape, seed=0)

    @jax.jit
    def draw(state):
        noise, state = fn(state, None, None)
        return noise

    with mesh:
        out = draw(state)
    jax.block_until_ready(out)
    assert out.shape == shape
    assert np.isfinite(np.asarray(out)).all()
    del x


def test_tp_unet_train_step(mesh8):
    from sonar_tpu.models import (
        UNetConfig,
        init_train_state,
        init_unet_params,
        make_train_step,
    )

    cfg = UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(1,), num_heads=4, norm_groups=4)
    params = shard_unet_params(init_unet_params(jax.random.key(0), cfg), mesh8)
    opt_state = init_train_state(params)
    batch = jax.device_put(
        jnp.asarray(np.random.default_rng(1).standard_normal(
            (mesh8.shape["dp"] * 2, 4, 16, 16)), jnp.float32),
        NamedSharding(mesh8, latent_spec(4)))
    step = jax.jit(make_train_step(cfg))
    params2, opt_state, loss = step(params, opt_state, batch, jax.random.key(2))
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss))


def _collective_count(jitted, *args) -> int:
    hlo = jitted.lower(*args).compile().as_text()
    markers = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all")
    return sum(1 for line in hlo.splitlines() if any(m in line for m in markers))


def _ancestral_run(noise):
    def model(xi, sigma, **kw):
        return xi * 0.9

    sigmas = jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32)
    return jax.jit(lambda v: sample_sonar_euler_ancestral(
        model, v, sigmas, noise_item=noise, seed=0))


def test_dp_sharded_run_matches_unsharded(mesh8):
    """The dp-sharded sampler trajectory equals the single-device one: same
    seed, jax.device_put vs not. Counter-based keys make the noise stream
    placement-independent; the only deviation allowed is reduction-order
    float error in the global normalization stats (≈1 ulp)."""
    dp = mesh8.shape["dp"]
    x_np = (np.random.default_rng(0).standard_normal((dp * 2, 4, 8, 8))
            .astype(np.float32) * 14.6)
    noise = NoiseChain([get_noise_item("gaussian"), get_noise_item("pyramid")])
    run = _ancestral_run(noise)
    out_plain = np.asarray(run(jnp.asarray(x_np)))
    sh = NamedSharding(mesh8, latent_spec(4))
    with mesh8:
        out_sh = run(jax.device_put(jnp.asarray(x_np), sh))
    np.testing.assert_allclose(np.asarray(out_sh), out_plain,
                               rtol=1e-5, atol=2e-5)


def test_dp_sharded_output_carries_expected_sharding(mesh8):
    """The sampler must preserve the input's NamedSharding end-to-end; a
    deliberately-wrong PartitionSpec is detected by the same equality."""
    dp = mesh8.shape["dp"]
    x_np = (np.random.default_rng(1).standard_normal((dp * 2, 4, 8, 8))
            .astype(np.float32) * 14.6)
    noise = NoiseChain([get_noise_item("gaussian")])
    run = _ancestral_run(noise)
    expected = NamedSharding(mesh8, latent_spec(4))
    with mesh8:
        out = run(jax.device_put(jnp.asarray(x_np), expected))
    assert out.sharding == expected

    # the check is discriminating: shard the channel axis on dp instead and
    # the equality must fail (this is what a wrong latent_spec would produce)
    wrong = NamedSharding(mesh8, P(None, "dp"))
    with mesh8:
        out_wrong = run(jax.device_put(jnp.asarray(x_np), wrong))
    assert out_wrong.sharding != expected


def test_noise_generation_collective_free_under_dp(mesh8):
    """A dp-sharded noise draw is pure shard-local work when no global
    normalization is requested: ZERO collectives in the compiled HLO. With
    global-stat normalization the collectives appear — proving the counter
    actually counts (SURVEY §5.8)."""
    dp = mesh8.shape["dp"]
    shape = (dp * 2, 4, 16, 16)
    sh = NamedSharding(mesh8, latent_spec(4))
    item = get_noise_item("pyramid")
    with mesh8:
        fn, state = make_noise_sampler(item, shape, seed=3, normalized=False)
        draw = jax.jit(lambda st: fn(st, None, None)[0], out_shardings=sh)
        assert _collective_count(draw, state) == 0

        fn_n, state_n = make_noise_sampler(item, shape, seed=3, normalized=True)
        draw_n = jax.jit(lambda st: fn_n(st, None, None)[0], out_shardings=sh)
        assert _collective_count(draw_n, state_n) > 0


def test_scale_noise_global_stats_under_sharding(mesh8):
    """scale_noise's global mean/std must be correct when the sample spans
    devices — GSPMD inserts the collective (SURVEY §5.8)."""
    from sonar_tpu.core.normalize import scale_noise, tstd

    x = jax.device_put(
        jnp.asarray(np.random.default_rng(2).standard_normal((8, 4, 16, 16)),
                    jnp.float32) * 3.0 + 1.0,
        NamedSharding(mesh8, P("dp")))
    with mesh8:
        out = jax.jit(lambda v: scale_noise(v, normalized=True))(x)
    assert abs(float(jnp.mean(out))) < 1e-3
    assert abs(float(tstd(out)) - 1.0) < 1e-3


def test_batched_cfg_under_dp_matches_pair(mesh8):
    """model_batched (one doubled-batch denoiser call — TPU-native CFG
    batching) under dp sharding: the concatenated 2B batch stays sharded
    on dp, the output keeps the latent sharding, and the trajectory is
    bit-comparable to the unsharded (model, model_uncond) pair path."""
    from sonar_tpu.api import SonarPipeline

    dp = mesh8.shape["dp"]
    x_np = np.random.default_rng(3).standard_normal((dp * 2, 4, 8, 8))
    x = shard_latent(jnp.asarray(x_np, jnp.float32) * 14.6, mesh8)

    def cond(xi, sb, **kw):
        s = jnp.asarray(sb, xi.dtype).reshape(-1, 1, 1, 1)
        return xi / (1.0 + s)

    def uncond(xi, sb, **kw):
        s = jnp.asarray(sb, xi.dtype).reshape(-1, 1, 1, 1)
        return (xi * 0.97) / (1.0 + s)

    def batched(x2, sb2, **kw):
        b = x2.shape[0] // 2
        sig = jnp.asarray(sb2)
        sc = sig if sig.ndim == 0 else sig[:b]
        su = sig if sig.ndim == 0 else sig[b:]
        return jnp.concatenate([cond(x2[:b], sc), uncond(x2[b:], su)], 0)

    sigmas = jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32)
    pipe = SonarPipeline(model_batched=batched, cfg_scale=6.0, seed=5)
    with mesh8:
        out = jax.jit(lambda v: pipe(v, sigmas))(x)
    jax.block_until_ready(out)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert out.sharding == x.sharding, f"lost sharding: {out.sharding}"
    pipe_pair = SonarPipeline(model=cond, model_uncond=uncond,
                              cfg_scale=6.0, seed=5)
    out_pair = pipe_pair(jnp.asarray(x_np, jnp.float32) * 14.6, sigmas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_pair),
                               rtol=1e-5, atol=2e-5)


def test_fsdp_param_sharding_train_step(mesh8):
    """FSDP layering: shard_unet_params(fsdp=True) must actually shard
    weight dims over dp (per-device param memory drops), the train step
    must compile with GSPMD-inserted gathers and produce the SAME loss as
    the replicated layout, and the updated params must keep their specs."""
    from sonar_tpu.models import (
        UNetConfig,
        init_train_state,
        init_unet_params,
        make_train_step,
    )
    from sonar_tpu.parallel import unet_param_shardings

    cfg = UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(1,), num_heads=4, norm_groups=4)
    raw = init_unet_params(jax.random.key(0), cfg)
    fsdp_tree = unet_param_shardings(raw, mesh8, fsdp=True)
    params_rep = shard_unet_params(raw, mesh8)
    params_fsdp = jax.device_put(raw, fsdp_tree)

    # at least the big conv/dense kernels picked up a dp-sharded dim...
    shardings = jax.tree_util.tree_leaves(fsdp_tree)
    assert any("dp" in str(s.spec) for s in shardings), \
        [str(s.spec) for s in shardings[:8]]
    # ...while 1-D norm scales/biases stay replicated (the FSDP
    # small-param exemption: sharding them is all overhead, no memory)
    flat = jax.tree_util.tree_flatten_with_path(fsdp_tree)[0]
    leaves_by_path = dict(jax.tree_util.tree_flatten_with_path(raw)[0])
    for p, s in flat:
        if leaves_by_path[p].ndim <= 1:
            assert "dp" not in str(s.spec), (p, s.spec)

    batch = jax.device_put(
        jnp.asarray(np.random.default_rng(1).standard_normal(
            (mesh8.shape["dp"] * 2, 4, 16, 16)), jnp.float32),
        NamedSharding(mesh8, latent_spec(4)))
    step = jax.jit(make_train_step(cfg))
    p_rep, _, loss_rep = step(params_rep, init_train_state(params_rep),
                              batch, jax.random.key(2))
    # one lowering serves both the HLO inspection and the execution
    fsdp_opt = init_train_state(params_fsdp)
    lowered = step.lower(params_fsdp, fsdp_opt, batch, jax.random.key(2))
    compiled = lowered.compile()
    p_f, opt_f, loss_f = compiled(params_fsdp, fsdp_opt, batch,
                                  jax.random.key(2))
    jax.block_until_ready(loss_f)
    # same math, different layout: loss matches to reduction-order error
    np.testing.assert_allclose(float(loss_f), float(loss_rep),
                               rtol=1e-5, atol=1e-6)
    # updated WEIGHTS keep the FSDP layout per-path (no silent
    # re-replication); 1-D leaves are replicated inputs and may come back
    # with whatever sharding GSPMD propagated — harmless scraps
    out_flat = dict(jax.tree_util.tree_flatten_with_path(p_f)[0])
    saw_dp = False
    for path, sh in flat:
        if leaves_by_path[path].ndim >= 2:
            assert out_flat[path].sharding.spec == sh.spec, (
                path, out_flat[path].sharding.spec, sh.spec)
            saw_dp = saw_dp or "dp" in str(sh.spec)
    assert saw_dp
    # the compiled step actually GATHERS weight shards: a replicated
    # layout also emits the gradient all-reduce, so only an all-gather
    # pins "FSDP, not replication"
    assert "all-gather" in compiled.as_text()


def test_fsdp_requires_the_axis():
    """fsdp=True with a mesh lacking the fsdp axis must raise, not
    silently return a replicated layout (the OOM-with-no-diagnostic trap)."""
    from sonar_tpu.models import UNetConfig, init_unet_params
    from sonar_tpu.parallel import unet_param_shardings

    mesh = make_mesh(8, axis_names=("data", "tp"))
    raw = init_unet_params(jax.random.key(0), UNetConfig(
        model_channels=16, channel_mult=(1,), num_res_blocks=1,
        attention_levels=(), norm_groups=4))
    with pytest.raises(ValueError, match="no 'dp' axis"):
        unet_param_shardings(raw, mesh, fsdp=True)
    # naming the right axis works
    tree = unet_param_shardings(raw, mesh, fsdp=True, fsdp_axis="data")
    assert any("data" in str(s.spec)
               for s in jax.tree_util.tree_leaves(tree))
