"""3D toroidal Worley/Voronoi noise (reference: VoronoiNoiseGenerator,
py/noise_generation.py:1291-1904).

Feature points + the z-depth walk are explicit state (SURVEY §5.4): the
carry holds per-octave-group feature points, ``z_curr`` and ``z_increment``;
the z-max reset/bounce/wrap policies are traced selects, so the temporal
correlation survives inside a ``lax.scan`` sampling loop.

The ``name:arg=val`` + ``+``-averaged mode mini-language
(py/noise_generation.py:1780-1845) is parsed at trace time (static strings).
Distance/result tables implement all 9 distance and 19 result modes,
including the reference's ``manhatten`` quirk (it actually computes
euclidean, py/noise_generation.py:1483-1485 — preserved, SURVEY §7.3).

TPU note: the hot op is the (B, C, H, W, N) distance reduction + top-k —
batched elementwise + sort, MXU-free but VPU-friendly; N is static.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core.normalize import normalize_to_scale, tmedian
from ..utils.misc import fallback
from .generators import Generator


def _parse_modes(spec: str, scale_key: str):
    """'a:x=1+b:y=2' → [(name, kwargs, scale)] with 1/len averaging."""
    modes = spec.split("+")
    base = 1.0 / len(modes)
    out = []
    for mode in modes:
        if ":" in mode:
            name, *rest = mode.split(":")
            kw = dict(tuple(v.strip() for v in item.split("=", 1)) for item in rest)
            scale = base * float(kw.pop(scale_key, 1.0))
        else:
            name, kw, scale = mode, {}, base
        kw = {k[1:] if k.startswith("_") and len(k) > 1 else k: v for k, v in kw.items()}
        out.append((name.strip().lower(), kw, scale))
    return out


_FIXED_PREFIX = {"f1": 1, "f2": 2, "f3": 3, "f4": 4,
                 "inv_f1": 1, "inv_f2": 2, "inv_f3": 3, "inv_f4": 4,
                 "cellid": 0, "fractal_norm": 0}


def _mode_prefix(name, kw):
    """How many smallest distances a result mode reads from env["sorted"]
    (None = needs the full sort). The f/diff family only reads a tiny
    ordered prefix, so a lax.top_k of the negation replaces a full
    N-element per-pixel sort (N can be hundreds of feature points)."""
    if name in _FIXED_PREFIX:
        return _FIXED_PREFIX[name]
    if name in ("f", "inv_f"):
        idx = int(kw.get("idx", 0))
        # negative idx is legal reference syntax (Python indexing from the
        # end of the sorted distances) — needs the full sort, not a prefix
        return None if idx < 0 else idx + 1
    if name in ("diff", "diff2"):
        i1, i2 = int(kw.get("idx1", 0)), int(kw.get("idx2", 1))
        return None if i1 < 0 or i2 < 0 else max(i1, i2) + 1
    if name == "ridge":
        return _mode_prefix(kw.get("name", "diff"), kw)
    if name == "fuzz":
        return _mode_prefix(kw.get("name", "f1"), kw)
    if name == "gradient_magnitude":
        a = _mode_prefix(kw.get("name1", "f4"), kw)
        b = _mode_prefix(kw.get("name2", "f4"), kw)
        return None if a is None or b is None else max(a, b)
    if name == "softmin":
        return None if kw.get("use_sorted") is not None else 0
    return None  # median_distance / unknown: full sort


def _sorted_prefix(parsed):
    """Combined prefix requirement of a parsed `+`-composed mode list."""
    k = 0
    for name, kw, _scale in parsed:
        mk = _mode_prefix(name, kw)
        if mk is None:
            return None
        k = max(k, mk)
    return k


def _ksmallest_iter(d, k):
    """k-smallest by iterative argmin extraction — k fused (reduce +
    select) passes instead of an opaque lax.top_k, so XLA can fuse the
    distance computation into the reductions and never materialize the
    (B, C, H, W, N) tensor. Values identical to the sort prefix (ties
    yield equal values either way)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    outs = []
    for _ in range(k):
        outs.append(jnp.min(d, axis=-1))
        if len(outs) < k:
            i = jnp.argmin(d, axis=-1)
            d = jnp.where(iota == i[..., None], jnp.inf, d)
    return jnp.stack(outs, axis=-1)


def _itermin_max_k() -> int:
    """Max prefix size routed through _ksmallest_iter (trace-time env
    knob SONAR_TPU_VORONOI_ITERMIN). Default 4: slope-timed 3.5x faster
    than lax.top_k at k=4/256 points on the chip (tools/bench_voronoi.py;
    the k fused reduce passes beat the opaque sort even at the largest
    eligible prefix, so smaller k only widens the gap)."""
    return int(os.environ.get("SONAR_TPU_VORONOI_ITERMIN", "4"))


def _sorted_small(d, k):
    """Ascending distances: full sort, or the k-smallest prefix (via
    iterative extraction or lax.top_k) when only a prefix is consumed
    (identical values; tie ordering may differ, which no consumer
    observes)."""
    if k is not None and 0 < k < d.shape[-1]:
        if k <= _itermin_max_k():
            return _ksmallest_iter(d, k)
        neg, _ = jax.lax.top_k(-d, k)
        return -neg
    if k == 0:  # defensive: no mode should call sorted() in this case
        return jnp.sort(d, axis=-1)
    return jnp.sort(d, axis=-1)


def _normalize_vec(d, axis=-1, eps=1e-12):
    return d / jnp.maximum(jnp.linalg.norm(d, axis=axis, keepdims=True), eps)


# result modes whose computation only reads env["sorted"] / env["key"]
# (never d or d_orig) — the surface the fused kernel can serve directly
_SORTED_ONLY = {"f", "f1", "f2", "f3", "f4",
                "inv_f", "inv_f1", "inv_f2", "inv_f3", "inv_f4",
                "diff", "diff2"}


def _result_sorted_only(name, kw) -> bool:
    if name in _SORTED_ONLY:
        return True
    if name == "ridge":
        return _result_sorted_only(kw.get("name", "diff"), kw)
    if name == "fuzz":
        return _result_sorted_only(kw.get("name", "f1"), kw)
    if name == "gradient_magnitude":
        return (_result_sorted_only(kw.get("name1", "f4"), kw)
                and _result_sorted_only(kw.get("name2", "f4"), kw))
    return False


# distance modes expressible as a per-axis reduction over wrapped diffs
# (the manhatten quirk IS euclidean — py/noise_generation.py:1483)
_AXIS_DISTS = {"euclidean", "manhatten", "quadratic", "chebyshev",
               "minkowski"}


def _simple_distance(parsed):
    """(dist, p, weights, dscale) for a single simple (optionally
    weight-wrapped) distance spec, else None. Covers the per-axis XLA
    fast path and the fused kernel's distance surface."""
    if len(parsed) != 1:
        return None
    name, kw, dscale = parsed[0]
    weights = None
    if name == "weight":
        kw = dict(kw)
        name = kw.pop("name", "euclidean")
        weights = (float(kw.pop("h", 1.0)), float(kw.pop("w", 1.0)),
                   float(kw.pop("z", 0.25)))
    if name not in _AXIS_DISTS:
        return None
    if name == "manhatten":
        name = "euclidean"
    p = float(kw.get("p", 3.0)) if name == "minkowski" else 3.0
    return name, p, weights, dscale


class VoronoiGenerator(Generator):
    name = "voronoi"
    MIN_DIMS = 4
    MAX_DIMS = 4
    # the reference's VoronoiNoiseGenerator overrides the base default to
    # normalized=False (py/noise_generation.py:1352): raw distance fields
    # keep their natural scale inside compositions (e.g. voronoi_mix sums
    # RAW voronoi x0.6 + raw gaussian x0.4 and normalizes once at the wrap)
    DEFAULT_NORMALIZED = False

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "n_points": (32,),
            "distance_mode": ("euclidean",),
            "z_initial": 0.0,
            "z_increment": 1.0,
            "z_max": 100000,
            "z_max_mode": "reset",
            "z_range": None,
            "result_mode": ("f1",),
            "octaves": 1,
            "octave_mode": "same_features",
            "lacunarity": 2.0,
            "gain": 0.5,
            "initial_amplitude": 1.0,
            "initial_scale": 1.0,
            "noise_sampler_factory": None,
        }

    # -- feature-point state ----------------------------------------------------

    def _octave_groups(self) -> int:
        return self.octaves if self.octave_mode == "new_features" else 1

    def _npoints(self, group: int) -> int:
        pts = tuple(max(2, v) for v in self.n_points)
        return pts[group % len(pts)]

    def _draw_feature_points(self, ctx, state, key, sigma, sigma_next):
        """Fresh feature points per octave group, uniform or from the
        injected factory normalized to [0,1] (py/noise_generation.py:1367-1404)."""
        fps = []
        for g in range(self._octave_groups()):
            shape = (ctx.batch, ctx.channels, self._npoints(g), 3)
            kg = jax.random.fold_in(key, g)
            if self.noise_sampler_factory is None:
                fps.append(jax.random.uniform(kg, shape, ctx.dtype))
            else:
                fctx = ctx.with_shape(shape)
                n, st = self.noise_sampler_factory.sample(
                    fctx, state["factory"][g], kg, sigma, sigma_next,
                    normalized=False)
                state = {**state,
                         "factory": state["factory"][:g] + (st,) + state["factory"][g + 1:]}
                fps.append(normalize_to_scale(n, 0.0, 1.0, dim=(-1, -2)))
        return tuple(fps), state

    def init_state(self, ctx, key):
        state = {}
        if self.noise_sampler_factory is not None:
            state["factory"] = tuple(
                self.noise_sampler_factory.init_state(
                    ctx.with_shape((ctx.batch, ctx.channels, self._npoints(g), 3)),
                    jax.random.fold_in(key, 1000 + g))
                for g in range(self._octave_groups())
            )
        fps, state = self._draw_feature_points(ctx, state, key, None, None)
        state["fp"] = fps
        state["z"] = jnp.asarray(float(self.z_initial), ctx.dtype)
        state["zinc"] = jnp.asarray(float(self.z_increment), ctx.dtype)
        return state

    def _feature_points(self, state, octave: int):
        """Octave-mode transformed feature points (py/noise_generation.py:
        1427-1447)."""
        fp = state["fp"][octave % len(state["fp"])]
        odd = (octave % 2) == 1
        om = self.octave_mode
        if (om == "same_invert_odd" and odd) or (om == "same_invert_even" and not odd):
            return 1.0 - fp
        if octave > 0 and om in {"same_roll_chan_up", "same_roll_chan_down"}:
            return jnp.roll(fp, (-1 if om.endswith("up") else 1) * (octave % 3), axis=1)
        if octave > 0 and om in {"same_roll_dir_up", "same_roll_dir_down"}:
            return jnp.roll(fp, (-1 if om.endswith("up") else 1) * (octave % 3), axis=3)
        return fp

    # -- distance modes ----------------------------------------------------------

    def _dist(self, name, d, kw, key):
        fn = getattr(self, f"_distance_{name}", None)
        if fn is None:
            raise ValueError(f"Bad Voronoi distance mode {name}")
        return fn(d, kw, key)

    def _distance_euclidean(self, d, kw, key):
        return jnp.sqrt(jnp.sum(d * d, axis=-1))

    # reference quirk: manhatten computes euclidean (py/noise_generation.py:1483)
    _distance_manhatten = _distance_euclidean

    def _distance_chebyshev(self, d, kw, key):
        return jnp.max(jnp.abs(d), axis=-1)

    def _distance_minkowski(self, d, kw, key):
        p = float(kw.get("p", 3.0))
        return jnp.sum(jnp.abs(d) ** p, axis=-1) ** (1.0 / p)

    def _distance_quadratic(self, d, kw, key):
        return jnp.sum(d * d, axis=-1)

    def _distance_angle(self, d, kw, key):
        idx = int(kw.get("idx", 2))
        return jnp.arccos(jnp.clip(_normalize_vec(d)[..., idx], -1.0, 1.0))

    def _distance_angle_tanh(self, d, kw, key):
        idx = int(kw.get("idx", 2))
        return jnp.arccos(jnp.tanh(_normalize_vec(d)[..., idx]))

    def _distance_angle_sigmoid(self, d, kw, key):
        idx = int(kw.get("idx", 2))
        return jnp.arccos(jax.nn.sigmoid(_normalize_vec(d)[..., idx]) * 2.0 - 1.0)

    def _distance_weight(self, d, kw, key):
        kw = dict(kw)
        name = kw.pop("name", "euclidean")
        weights = jnp.asarray(
            (float(kw.pop("h", 1.0)), float(kw.pop("w", 1.0)), float(kw.pop("z", 0.25))),
            d.dtype,
        )
        return self._dist(name, d * weights, kw, key)

    def _distance_fractal_norm(self, d, kw, key):
        kw = dict(kw)
        name = kw.pop("name", "euclidean")
        mode = kw.pop("mode", "sin")
        if mode not in ("sin", "cos"):
            raise ValueError(
                "Bad mode parameter for fractal_norm distance mode, must be one of: sin, cos"
            )
        fun = jnp.sin if mode == "sin" else jnp.cos
        adj = float(kw.pop("scale", 0.1)) * fun(d * float(kw.pop("multiplier", 10.0)))
        return self._dist(name, d + adj, kw, key)

    def _distance_fuzz(self, d, kw, key):
        kw = dict(kw)
        name = kw.pop("name", "euclidean")
        fuzz = float(kw.pop("fuzz", 0.25))
        result = self._dist(name, d, kw, jax.random.fold_in(key, 1))
        rmin, rmax = jnp.min(result), jnp.max(result)
        amt = jnp.maximum(jnp.abs(rmin), jnp.abs(rmax)) * fuzz
        result = result + (jax.random.uniform(key, result.shape, result.dtype) * 2 - 1) * amt
        return normalize_to_scale(result, rmin, rmax, dim=(-2, -1))

    # -- result modes --------------------------------------------------------------

    def _res(self, name, d, env, kw):
        fn = getattr(self, f"_result_{name}", None)
        if fn is None:
            raise ValueError(f"Bad Voronoi result mode {name}")
        return fn(d, env, kw)

    def _result_f(self, d, env, kw):
        return env["sorted"]()[..., int(kw.get("idx", 0))]

    def _result_f1(self, d, env, kw):
        return env["sorted"]()[..., 0]

    def _result_f2(self, d, env, kw):
        return env["sorted"]()[..., 1]

    def _result_f3(self, d, env, kw):
        return env["sorted"]()[..., 2]

    def _result_f4(self, d, env, kw):
        return env["sorted"]()[..., 3]

    def _result_inv_f(self, d, env, kw):
        eps = float(kw.get("eps", 1e-06))
        return 1.0 / (self._result_f(d, env, kw) + eps)

    def _result_inv_f1(self, d, env, kw):
        return self._result_inv_f(d, env, {**kw, "idx": 0})

    def _result_inv_f2(self, d, env, kw):
        return self._result_inv_f(d, env, {**kw, "idx": 1})

    def _result_inv_f3(self, d, env, kw):
        return self._result_inv_f(d, env, {**kw, "idx": 2})

    def _result_inv_f4(self, d, env, kw):
        return self._result_inv_f(d, env, {**kw, "idx": 3})

    def _result_diff(self, d, env, kw):
        i1, i2 = int(kw.get("idx1", 0)), int(kw.get("idx2", 1))
        s = env["sorted"]()
        return s[..., i2] - s[..., i1]

    def _result_diff2(self, d, env, kw):
        i1, i2 = int(kw.get("idx1", 0)), int(kw.get("idx2", 1))
        s = env["sorted"]()
        return (s[..., i2] - s[..., i1]) / (s[..., i2] + s[..., i1] + 1e-06)

    def _result_cellid(self, d, env, kw):
        ids = jnp.argmin(d, axis=-1).astype(d.dtype)
        return ids / jnp.max(ids) + 1.0

    def _result_ridge(self, d, env, kw):
        kw = dict(kw)
        name = kw.pop("name", "diff")
        exp = float(kw.pop("exp", -10.0))
        return 1.0 - exp * self._res(name, d, env, kw)

    def _result_median_distance(self, d, env, kw):
        return tmedian(env["sorted"](), axis=-1)

    def _result_softmin(self, d, env, kw):
        temperature = float(kw.get("temperature", 50.0))
        d_norm = jnp.linalg.norm(env["d_orig"], axis=-1)
        w = jax.nn.softmax(-d_norm * temperature, axis=-1)
        eff = env["sorted"]() if kw.get("use_sorted") is not None else d
        return jnp.sum(eff * w, axis=-1)

    def _result_gradient_magnitude(self, d, env, kw):
        kw = dict(kw)
        name1 = kw.pop("name1", "f4")
        name2 = kw.pop("name2", "f4")
        pad_mode = kw.pop("pad_mode", "replicate")
        np_mode = {"replicate": "edge", "reflect": "reflect",
                   "circular": "wrap", "constant": "constant"}[pad_mode]
        r1 = self._res(name1, d, env, kw)
        pad_cfg = [(0, 0)] * (r1.ndim - 2) + [(1, 1), (1, 1)]
        r1p = jnp.pad(r1, pad_cfg, mode=np_mode)
        if name2 != name1:
            r2p = jnp.pad(self._res(name2, d, env, kw), pad_cfg, mode=np_mode)
        else:
            r2p = r1p
        dx = r1p[..., 1:-1, 2:] - r2p[..., 1:-1, :-2]
        dy = r1p[..., 2:, 1:-1] - r2p[..., :-2, 1:-1]
        return jnp.sqrt(dx**2 + dy**2)

    def _result_fractal_norm(self, d, env, kw):
        kw = dict(kw)
        name = kw.pop("name", "diff")
        mode = kw.pop("mode", "sin")
        if mode not in ("sin", "cos"):
            raise ValueError(
                "Bad mode parameter for fractal_norm result mode, must be one of: sin, cos"
            )
        fun = jnp.sin if mode == "sin" else jnp.cos
        d_adj = float(kw.pop("scale", 0.1)) * fun(d * float(kw.pop("multiplier", 10.0)))
        cache = {}
        k = _mode_prefix(name, kw)

        def my_sorted():
            if "s" not in cache:
                cache["s"] = _sorted_small(d_adj, k)
            return cache["s"]

        return self._res(name, d_adj, {**env, "sorted": my_sorted}, kw)

    def _result_fuzz(self, d, env, kw):
        kw = dict(kw)
        name = kw.pop("name", "f1")
        fuzz = float(kw.pop("fuzz", 0.25))
        result = self._res(name, d, env, kw)
        rmin, rmax = jnp.min(result), jnp.max(result)
        amt = jnp.maximum(jnp.abs(rmin), jnp.abs(rmax)) * fuzz
        key = env["key"]
        result = result + (jax.random.uniform(key, result.shape, result.dtype) * 2 - 1) * amt
        return normalize_to_scale(result, rmin, rmax, dim=(-2, -1))

    # -- octave + main loop ----------------------------------------------------------

    def _apply_distance(self, d, octave, key):
        spec = self.distance_mode[octave % len(self.distance_mode)]
        result = None
        for i, (name, kw, scale) in enumerate(_parse_modes(spec, "dscale")):
            cur = self._dist(name, d, kw, jax.random.fold_in(key, i)) * scale
            result = cur if result is None else result + cur
        return result

    def _apply_result(self, d, d_orig, octave, key, sorted_override=None):
        spec = self.result_mode[octave % len(self.result_mode)]
        cache = {}
        k = _sorted_prefix(_parse_modes(spec, "rscale"))

        def get_sorted():
            if sorted_override is not None:
                return sorted_override
            if "s" not in cache:
                cache["s"] = _sorted_small(d, k)
            return cache["s"]

        env = {"d_orig": d_orig, "sorted": get_sorted, "key": key}
        result = None
        for i, (name, kw, scale) in enumerate(_parse_modes(spec, "rscale")):
            cur = self._res(name, d, {**env, "key": jax.random.fold_in(key, i)}, kw) * scale
            result = cur if result is None else result + cur
        return result

    def _kernel_plan(self, ctx, octave: int, h: int, w: int):
        """(dist, p, weights, dscale, k) when the fused TPU kernel can
        serve this octave's (distance, result) spec pair, else None."""
        from ..kernels.voronoi import use_voronoi_kernel, voronoi_kernel_supported

        if not use_voronoi_kernel() or jnp.dtype(ctx.dtype) != jnp.float32:
            return None
        dspec = self.distance_mode[octave % len(self.distance_mode)]
        simple = _simple_distance(_parse_modes(dspec, "dscale"))
        if simple is None or simple[3] <= 0:  # sorting needs dscale > 0
            return None
        parsed_r = _parse_modes(
            self.result_mode[octave % len(self.result_mode)], "rscale")
        if not all(_result_sorted_only(n, kw) for n, kw, _ in parsed_r):
            return None
        k = _sorted_prefix(parsed_r)
        # k == 1 stays on XLA: a single fused min-reduction over the
        # per-axis path beats the kernel's point loop (chip-measured
        # 218 vs 185 Mpix/s); the kernel wins once several extraction
        # passes are replaced (3.2x at k=4, profiles/ANALYSIS.md)
        npts = self._npoints(octave % self._octave_groups())
        if k is None or k < 2 or not voronoi_kernel_supported(
                h, w, k, simple[0], ctx.batch * ctx.channels, npts):
            return None
        return simple + (k,)

    def _axis_distance(self, simple, grid3d, fp, scale):
        """Distance tensor (B, C, H, W, N) accumulated per axis — the
        (B, C, H, W, N, 3) wrapped-diff tensor never exists (it is ~200MB
        at 128²/256 points; VERDICT r2 item 2). Same elementwise ops and
        reduction order as the generic path, so values are identical."""
        dist, p, weights, dscale = simple

        def axis(a):
            g = (grid3d[..., a] * scale) % 1.0  # (H, W)
            f = (fp[..., a] * scale) % 1.0  # (B, C, N)
            d = (g[None, None, :, :, None]
                 - f[:, :, None, None, :] + 0.5) % 1.0 - 0.5
            return d * weights[a] if weights is not None else d

        if dist == "euclidean":
            d = jnp.sqrt(axis(0) ** 2 + axis(1) ** 2 + axis(2) ** 2)
        elif dist == "quadratic":
            d = axis(0) ** 2 + axis(1) ** 2 + axis(2) ** 2
        elif dist == "chebyshev":
            d = jnp.maximum(jnp.maximum(jnp.abs(axis(0)), jnp.abs(axis(1))),
                            jnp.abs(axis(2)))
        else:  # minkowski
            d = (jnp.abs(axis(0)) ** p + jnp.abs(axis(1)) ** p
                 + jnp.abs(axis(2)) ** p) ** (1.0 / p)
        return d * dscale if dscale != 1.0 else d

    def _octave(self, ctx, state, key, octave: int, grid3d, scale: float):
        fp = self._feature_points(state, octave)  # (B, C, N, 3)
        kd, kr = jax.random.split(key)
        h, w = grid3d.shape[0], grid3d.shape[1]

        plan = self._kernel_plan(ctx, octave, h, w)
        if plan is not None:
            from ..kernels.voronoi import voronoi_ksmallest

            dist, p, weights, dscale, k = plan
            prefix = voronoi_ksmallest(
                fp, grid3d[:, 0, 0], grid3d[0, :, 1], grid3d[0, 0, 2],
                scale=scale, k=k,
                dist=dist, p=p, weights=weights or (1.0, 1.0, 1.0))
            if dscale != 1.0:
                prefix = prefix * dscale
            return self._apply_result(None, None, octave, kr,
                                      sorted_override=prefix)

        dspec = self.distance_mode[octave % len(self.distance_mode)]
        simple = _simple_distance(_parse_modes(dspec, "dscale"))
        rspec = self.result_mode[octave % len(self.result_mode)]
        if simple is not None and "softmin" not in rspec:
            # per-axis XLA fast path (softmin is the one consumer of the
            # full wrapped-diff tensor d_orig)
            d = self._axis_distance(simple, grid3d, fp, scale)
            return self._apply_result(d, None, octave, kr)

        g = (grid3d[None, None, :, :, None, :] * scale) % 1.0  # (1,1,H,W,1,3)
        f = (fp[:, :, None, None, :, :] * scale) % 1.0  # (B,C,1,1,N,3)
        d_orig = (g - f + 0.5) % 1.0 - 0.5  # toroidal wrap, [-0.5, 0.5)
        d = self._apply_distance(d_orig, octave, kd)
        return self._apply_result(d, d_orig, octave, kr)

    def generate(self, ctx, state, key, sigma, sigma_next):
        h, w = ctx.height, ctx.width
        kfp, krest = jax.random.split(key)
        # z-max policy (py/noise_generation.py:1871-1884); the reference's
        # "wrap" branch assigns a typo'd attribute (self.curr_z) making it a
        # no-op — implemented correctly here.
        z, zinc = state["z"], state["zinc"]
        over = (jnp.abs(self.z_initial - z) > abs(self.z_max)) | (self.z_max == 0)
        if self.z_max_mode == "reset":
            fresh, state = self._draw_feature_points(ctx, state, kfp, sigma, sigma_next)
            state = {**state, "fp": tuple(
                jnp.where(over, f_new, f_old)
                for f_new, f_old in zip(fresh, state["fp"])
            )}
            z = jnp.where(over, float(self.z_initial), z)
        elif self.z_max_mode == "bounce":
            zinc = jnp.where(over, -zinc, zinc)
            z = jnp.where(over, z + zinc, z)
        else:  # wrap
            z = jnp.where(over, float(self.z_initial), z)
        z_range = fallback(self.z_range, max(h, w))
        z_norm = (z % z_range) / z_range
        state = {**state, "z": z + zinc, "zinc": zinc}

        ys = jnp.linspace(0, h - 1, h, dtype=ctx.dtype) / h
        xs = jnp.linspace(0, w - 1, w, dtype=ctx.dtype) / w
        grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
        grid3d = jnp.concatenate(
            [grid, jnp.full((h, w, 1), z_norm, ctx.dtype)], axis=-1)

        result = jnp.zeros(ctx.shape, ctx.dtype)
        amplitude = self.initial_amplitude
        scale = self.initial_scale
        total = 0.0
        for octave in range(self.octaves):
            out = self._octave(ctx, state, jax.random.fold_in(krest, octave),
                               octave, grid3d, scale)
            result = result + out * amplitude
            total += abs(amplitude)
            amplitude *= self.gain
            scale *= self.lacunarity
        return result / (total if total != 0 else 1.0), state
