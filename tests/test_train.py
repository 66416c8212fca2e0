"""Training-step tests: remat policies, determinism, and memory effect.

The reference never trains (the denoiser is host-supplied); the train
path is a framework capability beyond reference parity, so these tests
validate it internally rather than against an oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.models import (
    UNetConfig,
    init_train_state,
    init_unet_params,
    make_train_step,
)

CFG = UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                 attention_levels=(1,), num_heads=4, norm_groups=4)


def _one_step(remat):
    params = init_unet_params(jax.random.key(0), CFG)
    opt_state = init_train_state(params)
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 16, 16)), jnp.float32)
    step = jax.jit(make_train_step(CFG, remat=remat))
    params2, opt_state2, loss = step(params, opt_state, batch,
                                     jax.random.key(1))
    jax.block_until_ready(loss)
    return params2, float(loss)


@pytest.mark.parametrize("remat", [True, "full", "dots"])
def test_remat_matches_no_remat(remat):
    """Remat changes scheduling, not math: params after one step must be
    bit-comparable with and without rematerialization."""
    p_ref, loss_ref = _one_step(False)
    p_rem, loss_rem = _one_step(remat)
    assert loss_rem == pytest.approx(loss_ref, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_rem)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_remat_unknown_policy_raises():
    with pytest.raises(ValueError, match="unknown remat policy"):
        make_train_step(CFG, remat="bogus")


def test_remat_transform_is_applied():
    """The remat knob must actually insert jax.checkpoint into the traced
    step (the jaxpr carries a remat/checkpoint equation). The memory
    effect itself is only observable in TPU liveness scheduling — the CPU
    backend's memory_analysis reports identical temp sizes either way —
    so correctness of application is what's asserted portably."""
    params = init_unet_params(jax.random.key(0), CFG)
    opt_state = init_train_state(params)
    batch = jnp.zeros((2, 4, 16, 16), jnp.float32)

    def jaxpr_text(remat):
        step = make_train_step(CFG, remat=remat)
        return str(jax.make_jaxpr(step)(params, opt_state, batch,
                                        jax.random.key(1)))

    assert "remat" in jaxpr_text("full") or "checkpoint" in jaxpr_text("full")
    assert "remat" not in jaxpr_text(False)


def test_remat_reduces_live_activation_memory_tpu():
    """On TPU, the compiled backward with remat='full' must allocate less
    temp memory than without (the point of the knob)."""
    if jax.default_backend() == "cpu":
        pytest.skip("CPU memory_analysis does not model liveness")
    params = init_unet_params(jax.random.key(0), CFG)
    opt_state = init_train_state(params)
    batch = jnp.zeros((8, 4, 64, 64), jnp.float32)

    def temp_bytes(remat):
        step = jax.jit(make_train_step(CFG, remat=remat))
        compiled = step.lower(params, opt_state, batch,
                              jax.random.key(1)).compile()
        m = compiled.memory_analysis()
        if m is None:
            pytest.skip("backend lacks memory_analysis")
        return m.temp_size_in_bytes

    full = temp_bytes(False)
    remat = temp_bytes("full")
    assert remat < full, (
        f"remat temp {remat} not below no-remat temp {full}")


def test_train_loss_decreases():
    """A few steps on a fixed batch must reduce the loss (sanity that the
    optimizer wiring actually trains)."""
    import optax

    params = init_unet_params(jax.random.key(0), CFG)
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(params)
    batch = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 4, 16, 16)), jnp.float32)
    step = jax.jit(make_train_step(CFG, optimizer))
    losses = []
    for i in range(8):
        # fixed noise key: deterministic objective so the decrease is real
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.key(2))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/restore_checkpoint must round-trip the full train
    state bit-exactly, and restore must honor a sharded target."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sonar_tpu.models.checkpoint import restore_checkpoint, save_checkpoint
    from sonar_tpu.parallel import make_mesh

    params = init_unet_params(jax.random.key(0), CFG)
    opt_state = init_train_state(params)
    state = {"params": params, "opt_state": opt_state, "step": jnp.asarray(7)}
    path = tmp_path / "ckpt"
    save_checkpoint(path, state)
    restored = restore_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # STRUCTURE must round-trip too, not just the leaves: orbax stores
    # custom nodes (optax NamedTuples) as lists, and a restored opt_state
    # that lost its structure crashes optimizer.update (review r3 finding)
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(state))

    # sharded restore: land every leaf replicated on an 8-device mesh
    mesh = make_mesh(8, axis_names=("dp", "tp"))
    sh = NamedSharding(mesh, P())
    target = jax.tree_util.tree_map(
        lambda leaf: jax.ShapeDtypeStruct(jnp.shape(leaf),
                                          jnp.asarray(leaf).dtype,
                                          sharding=sh),
        state)
    restored_sharded = restore_checkpoint(path, target=target)
    leaf = jax.tree_util.tree_leaves(restored_sharded)[0]
    assert leaf.sharding == sh
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored_sharded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # FSDP-layout restore: land the params directly in the dp-sharded
    # layout (the multi-chip resume path — no replicated intermediate)
    from sonar_tpu.parallel import unet_param_shardings

    fsdp_sh = unet_param_shardings(params, mesh, fsdp=True)
    fsdp_target = jax.tree_util.tree_map(
        lambda leaf, s: jax.ShapeDtypeStruct(jnp.shape(leaf),
                                             jnp.asarray(leaf).dtype,
                                             sharding=s),
        params, fsdp_sh)
    restored_fsdp = restore_checkpoint(path, target={"params": fsdp_target},
                                       partial=True)
    got_specs = {str(leaf.sharding.spec) for leaf in
                 jax.tree_util.tree_leaves(restored_fsdp["params"])}
    assert any("dp" in s for s in got_specs), got_specs
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored_fsdp["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_precision_training():
    """compute_dtype=bf16: master weights and gradients stay float32, the
    loss is finite and close to the f32 loss (bf16 has ~3 decimal digits),
    and training still decreases the loss."""
    import optax

    params = init_unet_params(jax.random.key(0), CFG)
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(params)
    batch = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 4, 16, 16)), jnp.float32)
    step_mp = jax.jit(make_train_step(CFG, optimizer,
                                      compute_dtype=jnp.bfloat16))
    step_fp = jax.jit(make_train_step(CFG, optimizer))
    _, _, loss_fp = step_fp(params, opt_state, batch, jax.random.key(2))
    p, s = params, opt_state
    losses = []
    for _ in range(8):
        p, s, loss = step_mp(p, s, batch, jax.random.key(2))
        losses.append(float(loss))
    # master weights stayed f32
    assert all(leaf.dtype == jnp.float32
               for leaf in jax.tree_util.tree_leaves(p))
    assert np.isfinite(losses).all()
    assert abs(losses[0] - float(loss_fp)) < 0.05 * max(1.0, float(loss_fp))
    assert losses[-1] < losses[0] * 0.9, losses


def test_checkpoint_restore_usable_by_optimizer(tmp_path):
    """The target-less restore must hand back an opt_state the optimizer
    actually accepts (NamedTuple structure intact) — the advertised
    (params, opt_state) round-trip, reproduced broken in review r3."""
    import optax

    from sonar_tpu.models.checkpoint import restore_checkpoint, save_checkpoint

    params = init_unet_params(jax.random.key(0), CFG)
    optimizer = optax.adam(2e-3)
    state = {"params": params, "opt_state": optimizer.init(params)}
    path = tmp_path / "ckpt_opt"
    save_checkpoint(path, state)
    restored = restore_checkpoint(path)
    grads = jax.tree_util.tree_map(jnp.ones_like, restored["params"])
    updates, _ = optimizer.update(grads, restored["opt_state"],
                                  restored["params"])
    new_params = optax.apply_updates(restored["params"], updates)
    assert (jax.tree_util.tree_structure(new_params)
            == jax.tree_util.tree_structure(params))


def test_sigma_embedding_f32_under_bf16():
    """The sinusoidal sigma embedding must compute its angles in float32
    even when the UNet computes in bf16: the high-frequency bands reach
    ~2.7e3 rad, where bf16's quantization step (~8-16 rad) destroys the
    noise-level conditioning (review r3 finding). The bf16 embedding must
    match the f32 one to bf16 rounding of the OUTPUT, not of the angle."""
    from sonar_tpu.models.unet import _sigma_embedding

    sigma = jnp.asarray([14.6, 1.0, 0.03], jnp.float32)
    emb32 = _sigma_embedding(sigma, 320, jnp.float32)
    emb16 = _sigma_embedding(sigma, 320, jnp.bfloat16)
    assert emb16.dtype == jnp.bfloat16
    # bf16 rounding of a value in [-1,1] is <= 2^-8; angle-domain
    # quantization would show errors up to O(1)
    err = np.abs(np.asarray(emb16, np.float32) - np.asarray(emb32))
    assert err.max() <= 2 ** -8 + 1e-6, err.max()


def test_ema_update_tracks_params():
    """EMA must move toward params at rate (1-decay) and converge onto a
    fixed target; jit-compatible."""
    from sonar_tpu.models import ema_update

    params = {"w": jnp.ones((4,)) * 2.0, "b": jnp.zeros((2,))}
    ema = jax.tree_util.tree_map(jnp.zeros_like, params)
    step = jax.jit(lambda e, p: ema_update(e, p, decay=0.9))
    for _ in range(100):
        ema = step(ema, params)
    for e, p in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-4)
    # one step from zero moves exactly (1-decay)*params
    one = ema_update(jax.tree_util.tree_map(jnp.zeros_like, params), params,
                     decay=0.9)
    np.testing.assert_allclose(np.asarray(one["w"]),
                               0.1 * np.asarray(params["w"]), rtol=1e-6)
