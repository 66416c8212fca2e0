"""Generalized-Collatz chain noise (reference: CollatzNoiseGenerator,
py/noise_generation.py:2330-2615).

The reference fills chain positions with a Python loop of strided
scatter-writes ("EXTREMELY slow", cooperatively interrupted every 25
iterations). Here each iteration's chain recurrence is one ``lax.scan`` over
the (static) chain length emitting the (values, adds, muls) triple, and the
chunk-major/step-minor layout is a single reshape — the whole generator
compiles into one XLA program with no host synchronization.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.normalize import normalize_to_scale, quantile_normalize
from ..utils.misc import trunc_decimals
from .generators import Generator


class CollatzGenerator(Generator):
    name = "collatz"

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "adjust_scale": False,
            "iteration_sign_flipping": True,
            "chain_length": (1, 1, 2, 2, 3, 3),
            "iterations": 10,
            "rmin": -8000.0,
            "rmax": 8000.0,
            "flatten": False,
            "dims": (-1, -1, -2, -2),
            "output_mode": "values",
            "quantile": 0.5,
            "quantile_strategy": "clamp",
            "noise_dtype": jnp.float32,
            "integer_math": True,
            "even_multiplier": 0.5,
            "even_addition": 0.0,
            "odd_multiplier": 3.0,
            "odd_addition": 1.0,
            "add_preserves_sign": True,
            "chain_offset": 5,
            "break_loops": True,
            "seed_mode": "default",
            "seed_noise_sampler": None,
            "mix_noise_sampler": None,
        }

    # -- child plumbing -------------------------------------------------------
    def _children(self):
        return {
            "seed": self.seed_noise_sampler,
            "mix": self.mix_noise_sampler,
        }

    def init_state(self, ctx, key):
        return {
            k: (None if c is None else c.init_state(ctx, jax.random.fold_in(key, i)))
            for i, (k, c) in enumerate(self._children().items())
        }

    # -- one iteration ---------------------------------------------------------
    def _chain_scan(self, noise, chain_len_total):
        """Run the generalized-Collatz recurrence; returns stacked
        (values, adds, muls) with a leading step axis of chain_len_total."""
        emul, eadd = self.even_multiplier, self.even_addition
        omul, oadd = self.odd_multiplier, self.odd_addition
        keepsign = self.add_preserves_sign

        def step(carry, _):
            prev, prev_adds, prev_muls = carry
            prev_trunc = trunc_decimals(prev, 2)
            if self.break_loops:
                need_reset = ((prev_trunc >= 1.0) & (prev_trunc < 1.001)) | (
                    jnp.abs(prev_trunc) < 0.001
                )
            else:
                need_reset = jnp.zeros(prev.shape, bool)
            prev_evens = (prev % 2) < 1.0
            muls_next = jnp.where(prev_evens, prev_muls * emul, prev_muls * omul)
            muls_next = jnp.where(need_reset, 1.0, muls_next)
            prev_adds_scaled = prev_adds * muls_next
            prev_sign = jnp.sign(prev) if keepsign else 1.0
            adds_next = jnp.where(
                prev_evens,
                prev_adds_scaled + eadd * prev_sign,
                prev_adds_scaled + oadd * prev_sign,
            )
            adds_next = jnp.where(need_reset, 0.0, adds_next)
            result_next = noise * muls_next + adds_next
            if self.integer_math:
                result_next = jnp.trunc(result_next)
            result_next = jnp.where(need_reset, noise, result_next)
            return (result_next, adds_next, muls_next), (result_next, adds_next, muls_next)

        init = (noise, jnp.zeros_like(noise), jnp.ones_like(noise))
        _, (vals, adds, muls) = jax.lax.scan(step, init, None,
                                             length=chain_len_total - 1)
        vals = jnp.concatenate([noise[None], vals], axis=0)
        adds = jnp.concatenate([jnp.zeros_like(noise)[None], adds], axis=0)
        muls = jnp.concatenate([jnp.ones_like(noise)[None], muls], axis=0)
        return vals, adds, muls

    def _interleave(self, stacked, dim):
        """(CL, ..., n_chunks@dim, ...) → (..., n_chunks*CL@dim, ...),
        chunk-major step-minor — the reference's strided-write layout."""
        cl = stacked.shape[0]
        moved = jnp.moveaxis(stacked, 0, dim + 1)  # step axis right after dim
        shape = moved.shape
        return moved.reshape(shape[:dim] + (shape[dim] * cl,) + shape[dim + 2:])

    def _generate_iteration(self, ctx, state, key, sigma, sigma_next, *, dim,
                            chain_length):
        shape = tuple(ctx.shape)
        out_shape = shape
        if self.flatten:
            shape = shape[:dim] + (math.prod(shape[dim:]),)
        size = shape[dim]
        chain_length = min(size, chain_length)
        n_chunks = math.ceil(size / chain_length)
        cl_total = chain_length + self.chain_offset
        chunk_shape = list(shape)
        chunk_shape[dim] = n_chunks
        chunk_shape = tuple(chunk_shape)

        kseed, kmix = jax.random.split(key)
        if self.seed_noise_sampler is not None:
            seed_full, st = self.seed_noise_sampler.sample(
                ctx, state["seed"], kseed, sigma, sigma_next, normalized=False)
            state = {**state, "seed": st}
            if self.flatten:
                seed_full = seed_full.reshape(
                    seed_full.shape[:dim] + (math.prod(seed_full.shape[dim:]),))
            sl = tuple(slice(None, sz) for sz in chunk_shape)
            orig_noise = normalize_to_scale(
                seed_full[sl], 1e-06, 1.0, dim=tuple(range(1, len(chunk_shape))))
        else:
            orig_noise = jax.random.uniform(kseed, chunk_shape, self.noise_dtype)
        rmin, rmax = self.rmin, self.rmax
        noise = orig_noise.astype(self.noise_dtype) * (rmax - rmin + 1) + rmin
        noise = jnp.where(noise == 0, jnp.max(noise) / noise.size, noise)
        if self.seed_mode != "default":
            cond = (noise % 2.0) < 1 if self.seed_mode == "force_odd" else (noise % 2.0) >= 1
            noise = jnp.where(cond, noise + 1, noise)

        vals, adds, muls = self._chain_scan(noise, cl_total)
        result = self._interleave(vals, dim)
        adds_il = self._interleave(adds, dim)
        muls_il = self._interleave(muls, dim)

        omode = self.output_mode
        noise_exp = jnp.repeat(noise, cl_total, axis=dim)
        nadds = adds_il / noise_exp
        ratios = result / noise_exp
        if omode in {"values", "ratios", "seed_x_ratios", "noise_x_ratios"}:
            out1 = ratios
        elif omode in {"mults", "seed_x_mults", "noise_x_mults"}:
            out1 = muls_il
        elif omode in {"adds", "seed_x_adds", "noise_x_adds"}:
            out1 = nadds
        else:
            raise ValueError("Bad output mode")
        # trim the chain_offset warmup from every chunk
        if self.chain_offset >= 1:
            s = out1.shape
            grouped = out1.reshape(s[:dim] + (n_chunks, cl_total) + s[dim + 1:])
            sl = [slice(None)] * grouped.ndim
            sl[dim + 1] = slice(self.chain_offset, None)
            grouped = grouped[tuple(sl)]
            out1 = grouped.reshape(s[:dim] + (n_chunks * chain_length,) + s[dim + 1:])
        if self.quantile not in {0, 1}:
            out1 = quantile_normalize(out1, quantile=self.quantile, dim=0,
                                      strategy=self.quantile_strategy)
        output_slice = tuple(slice(None, sz) for sz in shape)
        out1 = out1[output_slice].reshape(out_shape).astype(ctx.dtype)
        if omode in {"ratios", "mults", "adds"}:
            return out1, state
        if omode in {"values", "seed_x_ratios", "seed_x_mults", "seed_x_adds"}:
            out2 = jnp.repeat(orig_noise, chain_length, axis=dim)
        else:  # noise_x_*
            if self.mix_noise_sampler is None:
                out2 = jax.random.normal(kmix, shape, out1.dtype)
            else:
                out2, st = self.mix_noise_sampler.sample(
                    ctx, state["mix"], kmix, sigma, sigma_next, normalized=False)
                state = {**state, "mix": st}
                if self.flatten:
                    out2 = out2.reshape(out2.shape[:dim] + (-1,))
        out2 = out2[output_slice].reshape(out_shape).astype(ctx.dtype)
        return out2 * out1, state

    def generate(self, ctx, state, key, sigma, sigma_next):
        out_dims = len(ctx.shape)
        dims = tuple(d if d >= 0 else out_dims + d for d in self.dims)
        if not all(0 <= d < out_dims for d in dims):
            raise ValueError("Dimension out of range")
        n_dims, n_cl = len(dims), len(self.chain_length)
        result = jnp.zeros(ctx.shape, ctx.dtype)
        it_scale = 1.0 / self.iterations
        for it in range(self.iterations):
            temp, state = self._generate_iteration(
                ctx, state, jax.random.fold_in(key, it), sigma, sigma_next,
                dim=dims[it % n_dims], chain_length=self.chain_length[it % n_cl])
            sign = -1.0 if self.iteration_sign_flipping and (it & 1) == 1 else 1.0
            result = result + temp * (it_scale * sign)
        if self.adjust_scale:
            result = normalize_to_scale(
                result, -1.0, 1.0,
                dim=tuple(range(1 if result.ndim < 4 else 2, result.ndim)))
        return result, state
