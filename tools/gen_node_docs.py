"""Generate docs/node_reference.md: a parameter table + semantics for every
registered node, from the generated schemas (sonar_tpu/api/schemas.py) plus
the hand-written descriptions below.

Regenerate with: python tools/gen_node_docs.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

from sonar_tpu.api.schemas import SCHEMAS  # noqa: E402
from sonar_tpu.api.validate import ADAPT, ALIASES  # noqa: E402

# Own-words semantics per node. Each entry: (one-line summary, extra prose).
DESC: dict[str, tuple[str, str]] = {
    "SonarCustomNoise": (
        "Append one registered noise type to a noise chain.",
        "The basic chain link: pick a `noise_type` from the registry, weight it "
        "with `factor`, optionally `rescale` the whole chain so its factors sum "
        "to the given value. Chain by feeding the result into another node's "
        "`sonar_custom_noise_opt`."),
    "SonarCustomNoiseAdv": (
        "Chain link with tri-state normalization and a YAML escape hatch.",
        "Like SonarCustomNoise plus per-item `normalize` override and "
        "`yaml_parameters` — a YAML dict merged into the generator's "
        "constructor arguments for parameters without widgets."),
    "SonarAdvancedPyramidNoise": (
        "Pyramid noise with every knob exposed.",
        "`variant` selects pyramid / pyramid_old / highres_pyramid; "
        "`iterations` is the ladder depth, `discount` the per-level gain, "
        "`upscale_mode` the interpolation used to bring coarse levels to full "
        "resolution."),
    "SonarAdvanced1fNoise": (
        "1/f (pink-family) spectral noise with directional shaping.",
        "`alpha` sets the spectral slope (negative = pinkish, positive = "
        "greenish); `k`, `vertical_factor`, `horizontal_factor` shape the "
        "frequency response; `use_sqrt` applies the square root to the "
        "spectral envelope."),
    "SonarAdvancedPowerLawNoise": (
        "Power-law amplitude noise (white/grey/velvet/violet family).",
        "`alpha` is the exponent applied to |gaussian| amplitudes; `use_sign` "
        "restores signs after exponentiation, `use_div_max_abs` normalizes by "
        "the max magnitude over `div_max_dims`."),
    "SonarAdvancedCollatzNoise": (
        "Chaotic noise from Collatz-like integer chains.",
        "Runs `iterations` of even/odd multiply-add chains (`even_multiplier`, "
        "`odd_multiplier`, ...) over seeds drawn from `seed_custom_noise` (or "
        "uniform ints), mixes per `output_mode` with noise from "
        "`mix_custom_noise`, then quantile-normalizes. Slow by construction in "
        "the reference; here the chains compile into one `lax.scan`."),
    "SonarAdvancedDistroNoise": (
        "Draw from any of 26 probability distributions.",
        "`distribution` picks the law; each distribution's parameters are the "
        "`<distribution>_<param>` widgets. `quantile_norm` + "
        "`quantile_norm_mode` clip outliers (mode maps to the (dim, flatten) "
        "pairs of the reference); `result_index` selects from distributions "
        "that emit extra batch dimensions."),
    "SonarAdvancedVoronoiNoise": (
        "Worley/Voronoi cellular noise with octaves and a mode mini-language.",
        "`distance_mode` / `result_mode` accept comma-separated mode strings "
        "(e.g. `euclidean`, `diff2`, `fuzz:name=angle_tanh:fuzz=0.1`); the "
        "z-axis walks by `z_increment` per draw with `z_max_mode` wrap/bounce; "
        "octaves follow `octave_mode`/`gain`/`lacunarity`."),
    "SonarWaveletNoise": (
        "Multi-octave value noise built by scaled wavelet-style accumulation.",
        "Generates `octaves` levels, each scaled by `octave_height_factor`/"
        "`octave_width_factor` and blended with `update_blend` using "
        "`update_blend_mode`; `persistence` decays amplitude per octave. "
        "`custom_noise` overrides the per-octave source."),
    "SonarModulatedNoise": (
        "Modulate child noise by reference-latent statistics.",
        "`modulation_type` intensity/frequency scales the child noise by the "
        "std of the reference latent over `dims`; spectral_signum filters the "
        "noise spectrum by its own log-amplitude quantiles. The reference "
        "latent defaults to the sampling latent x (carried as ctx.ref); "
        "`ref_latent_opt` overrides it."),
    "SonarRepeatedNoise": (
        "Cache noise draws and recycle them with random permutations.",
        "Keeps a ring of `repeat_length` cached tensors, recycling each up to "
        "`max_recycle` times; `permute` flips/rolls/negates reused tensors. "
        "Useful when the child noise is expensive."),
    "SonarScheduledNoise": (
        "Gate child noise to a sampling-percent window.",
        "Active between `start_percent` and `end_percent` (converted to sigmas "
        "via `model_sampling`); outside the window draws from "
        "`fallback_sonar_custom_noise` or returns zeros."),
    "SonarCompositeNoise": (
        "Blend two noise sources through a spatial mask.",
        "`sonar_custom_noise_src` where the mask is 1, `..._dst` where it is "
        "0; the mask is bilinearly resized to the latent. Note the reference "
        "swaps the src/dst normalize flags — preserved here."),
    "SonarGuidedNoise": (
        "Pull noise toward a reference latent.",
        "`method=linear` blends toward the shifted reference; `method=euler` "
        "takes an Euler step toward it using the exemplar latent's statistics "
        "for the shift. `guidance_factor` sets the strength."),
    "SonarRandomNoise": (
        "Randomly pick from the connected noise chain each draw.",
        "Selects `mix_count` distinct items from the chain per call and sums "
        "them. All children advance their state each draw (jit-static "
        "structure); only the chosen ones contribute."),
    "SonarChannelNoise": (
        "A different noise generator per latent channel.",
        "The chain is treated as a list, furthest item = channel 0. "
        "`insufficient_channels_mode` wraps/repeats/zeros when the chain is "
        "shorter than the channel count. (`mix_count` is accepted-and-ignored "
        "— it is declared but unused in the reference too.)"),
    "SonarBlendedNoise": (
        "Blend two noise items with any blend mode.",
        "`noise_2_percent` is the blend strength; with `custom_noise_mask` "
        "connected, the normalized mask (plus the percent as offset, clamped "
        "to [0,1]) becomes a per-pixel blend strength."),
    "SonarResizedNoise": (
        "Generate noise at a fixed size, then resize/crop to the latent.",
        "`width`/`height` are image-pixel sizes (divided by 8 for latent "
        "pixels). When the latent is smaller than the generation size, "
        "`downscale_strategy` scale/crop decides the output mapping; "
        "`initial_reference` controls whether the exemplar latent handed to "
        "the child is cropped or scaled."),
    "SonarResizedNoiseAdv": (
        "ResizedNoise with spatial_mode and compression exposed.",
        "`spatial_mode` absolute/relative/percentage interprets width/height; "
        "`spatial_compression` is the image→latent divisor (8 for SD)."),
    "SonarQuantileFilteredNoise": (
        "Clip or reshape noise outliers by quantile.",
        "`quantile` sets the cut (e.g. 0.85 = |values| above the 85th "
        "percentile are treated as outliers); `strategy` picks the handler "
        "(clamp, tanh, sigmoid, ... — 37+ registered); `dim`/`flatten` control "
        "the reduction axes; `norm_factor`/`norm_power` scale the result."),
    "SonarShuffledNoise": (
        "Shuffle noise elements along dimensions.",
        "`dims` (comma-separated) lists axes to shuffle; `percentages` the "
        "fraction of elements shuffled per axis; `no_identity` forbids "
        "fixed points. `fork_rng` only affects stream derivation here — "
        "streams are always isolated."),
    "SonarPatternBreakNoise": (
        "Break up structured patterns by blending toward decorrelated noise.",
        "`percentage` is the blend toward the pattern-broken tensor; "
        "`detail_level` shapes the decorrelation; `restore_scale` restores "
        "the original min/max range."),
    "SonarWaveletFilteredNoise": (
        "Split child noise into wavelet bands and rescale/replace them.",
        "Low band comes from `custom_noise`, the high bands optionally from "
        "`custom_noise_high`; yl/yh scales and wavelet settings come from "
        "`yaml_parameters` (see docs/wavelet_cfg.md for the wavelet config "
        "keys)."),
    "SonarScatternetFilteredNoise": (
        "Push child noise through a scattering transform.",
        "`scatternet_order` selects the depth: 1 = one ScatLayer (×7 "
        "channels, ÷2 spatial), 2 = the true second-order ScatLayerj2 "
        "(×49 channels, ÷4 spatial; level-2 q-shift filters and "
        "second-order re-scattering of the level-1 magnitudes), other "
        "values stack |order| first-order layers. `output_mode` picks how "
        "the scattering channels map back to the latent; "
        "`use_symmetric_filter` switches to the near_sym_b_bp/qshift_b_bp "
        "banks. The default backend is the reference ScatLayer's ×7 DTCWT "
        "(`wavelet_backend=\"dtcwt\"`); `wavelet_backend=\"dwt\"` is a "
        "cheaper ×4-channel real-DWT variant."),
    "SonarRippleFilteredNoise": (
        "Multiply noise by a moving sine/cosine wave along one dimension.",
        "`mode` sin/cos (+_copysign variants reassign signs); `period`, "
        "`offset`, `amplitude_high`/`amplitude_low` shape the wave; `roll` "
        "advances its phase every draw."),
    "SonarNormalizeNoiseToScale": (
        "Rescale noise into explicit value ranges.",
        "`mode=simple` maps to [min_negative_value, max_positive_value]; "
        "`mode=advanced` maps negative and positive parts separately. "
        "`std_multiplier`/`mean_multiplier` post-adjust the statistics. Note "
        "the reference parses std_dims/mean_dims from `dims` (quirk "
        "preserved)."),
    "SonarPerDimNoise": (
        "Call the child sampler repeatedly along one dimension.",
        "`dim` selects the axis; with `shrink_dim` the child sees a "
        "chunk_size-thick slice per call, otherwise full-size draws are "
        "sliced. Useful for e.g. per-batch-index noise."),
    "SonarLatentOperationFilteredNoise": (
        "Apply LATENT_OPERATION transforms to generated noise.",
        "Connect up to five `operation_N` inputs; they run in order on every "
        "draw."),
    "SonarCustomNoiseParameters": (
        "Override execution parameters of a child noise item.",
        "`override_dtype` casts generation; `frames_to_channels` folds 5D "
        "video latents; `ensure_square_aspect_ratio` generates square then "
        "crops; `fix_invalid` scrubs NaN/Inf; rng_* knobs re-derive the "
        "stream (device overrides are no-ops — XLA owns placement and "
        "streams are backend-independent)."),
    "SonarPowerFilter": (
        "Define a Fourier-domain band filter (composable).",
        "`min_freq`/`max_freq` bound the band, `alpha` tilts gain by "
        "frequency, `stretch`/`rotate`/`pnorm` shape the band geometry, "
        "`blur` (rel_bw) softens edges, `oversample` refines the build grid. "
        "Compose with another filter via `power_filter_opt` + `compose_mode`."),
    "SonarPowerNoise": (
        "Gaussian noise shaped by an inline power filter.",
        "The filter parameters are inline (same meaning as SonarPowerFilter); "
        "`mix` blends filtered with unfiltered noise, `common_mode` mixes a "
        "shared component across channels, `channel_correlation` weights it "
        "per channel; `time_brownian` integrates the stream over steps."),
    "SonarPowerFilterNoise": (
        "Filter any child noise through a SonarPowerFilter chain.",
        "Like SonarPowerNoise but the source is `sonar_custom_noise` and the "
        "filter comes from `sonar_power_filter`; `filter_norm_factor` "
        "normalizes filter energy."),
    "SonarPreviewFilter": (
        "Render a power filter's gain surface, kernel, and a sample draw.",
        "Returns a uint8 image array (no ComfyUI image pipeline needed); "
        "`preview_size` is `WxH`."),
    "NoisyLatentLike": (
        "Generate (or add) noise shaped like a given latent.",
        "`mul_by_sigmas` + `model_sampling` reproduce the reference's "
        "sigma-strength math including the max-denoise sqrt(1+σ₀²) rule; "
        "`repeat_batch` tiles draws along batch."),
    "SonarNoiseImage": (
        "Add generated noise to an RGB(A) image.",
        "`channel_mode` selects target channels (reference's B/G swap quirk "
        "preserved under strict_reference_compat); `blend_mode`/"
        "`blend_strength` apply it; `overflow_mode` clamps or rescales back "
        "to [0,1]; `greyscale_mode` uses one noise channel everywhere."),
    "SONAR_CUSTOM_NOISE to NOISE": (
        "Adapt a noise chain to the ComfyUI NOISE protocol.",
        "Returns an object with `generate_noise(latent_dict)` for "
        "SamplerCustomAdvanced-style consumers. Sigma-dependent items "
        "(brownian, scheduled) can't see sigmas through this interface — "
        "same restriction as the reference."),
    "SonarSplitNoiseChain": (
        "Wrap a sub-chain as a single chain link.",
        "The connected `custom_noise` chain is wrapped in a blend that "
        "returns it unchanged, so the whole sub-chain occupies one link "
        "(one factor, one normalization) in the outer chain."),
    "SamplerSonarEuler": (
        "Momentum Euler sampler (deterministic).",
        "`momentum` < 1 mixes the current update with `momentum_hist`-decayed "
        "history; `momentum_init` seeds the history (ZERO/RAND/SAMPLE); "
        "`direction` scales (and can negate) the base step; optional "
        "`guidance_cfg_opt` pulls toward a reference latent."),
    "SamplerSonarEulerA": (
        "Momentum Euler ancestral sampler.",
        "SamplerSonarEuler plus ancestral noise injection: `eta`/`s_noise` "
        "scale the injected noise, `noise_type` or `custom_noise_opt` choose "
        "its source."),
    "SamplerSonarDPMPPSDE": (
        "Momentum DPM++ SDE sampler.",
        "Two-stage DPM++ SDE with momentum applied at both stages; defaults "
        "to brownian noise. Momentum is halved after the first step as in "
        "the reference."),
    "SamplerConfigOverride": (
        "Override a wrapped sampler's keyword arguments.",
        "Wraps any SAMPLER and forces `eta`, `s_noise`, `s_churn`, `r`, "
        "`sde_solver`, the noise type, or YAML-supplied kwargs — only those "
        "the wrapped sampler's signature accepts are applied."),
    "SonarGuidanceConfig": (
        "Reference-latent guidance config for the sonar samplers.",
        "`guidance_type` linear/euler, `factor` strength, `start_step`/"
        "`end_step` the active window, `latent` the target."),
    "SonarLatentOperationQuantileFilter": (
        "LATENT_OPERATION: quantile-normalize a latent.",
        "Same quantile/strategy semantics as SonarQuantileFilteredNoise, "
        "applied as a latent operation."),
    "SonarLatentOperationAdvanced": (
        "Compose latent operations with sigma windows and blending.",
        "Runs `operation` (+`operation_N`) inside [end_sigma, start_sigma]; "
        "`input_multiplier`/`output_multiplier`/`difference_multiplier` scale "
        "the data flow; `blend_mode`/`blend_strength` mix with the original; "
        "`operation_alt` runs outside the window."),
    "SonarLatentOperationNoise": (
        "LATENT_OPERATION: add generated noise to the latent.",
        "`scale_to_sigma` multiplies by the current sigma; noise comes from "
        "`custom_noise`."),
    "SonarLatentOperationSetSeed": (
        "Set the RNG seed for a wrapped latent operation.",
        "With counter-based keys the save/restore half is a no-op; the seed "
        "feeds the wrapped operation's stream."),
    "SonarApplyLatentOperationCFG": (
        "Apply latent operations inside the CFG function.",
        "`mode` picks the tensor the operations see (cond/uncond/denoised "
        "combinations); `pred_flip_mode` flips prediction sign conventions; "
        "blend_* schedule the effect over sampling. Returns the patch "
        "function directly (no MODEL object needed)."),
    "SonarWaveletCFG": (
        "Per-frequency-band CFG via wavelet decomposition.",
        "Rules (from widgets or `yaml_parameters`) map sigma windows to "
        "yl/yh band scales applied to cond/uncond/difference/final; "
        "`fallback_mode` picks what runs outside all rules. See "
        "docs/wavelet_cfg.md for the rule schema. Returns a CFG function; "
        "set `verbose: true` on a rule to dump resolved scales per step."),
    "FreeUExtremeConfig": (
        "One FreeU-Extreme stage configuration.",
        "`stage_1..3` choose UNet stages, `target` backbone/skip/both, "
        "`start`/`end` the sampling-percent window, `slice`/`slice_offset` "
        "the channel range, `scale`+`blend`+`blend_mode` the effect, "
        "`hidden_mean` the v2 hidden-mean scaling; chain more configs via "
        "`frux_config_opt` and attach a filter via `sonar_power_filter_opt`."),
    "FreeUExtreme": (
        "FreeU v2-style block patches with arbitrary filters.",
        "Builds input/middle/output block patches from FreeUExtremeConfig "
        "chains. Takes `model_sampling` + `model_channels` instead of a "
        "ComfyUI MODEL; returns patches for the UNet apply function."),
    "SonarBlendFilterNoise": (
        "Blend chain items with frequency filtering and enhancement.",
        "Native replacement for the bleh integration: `ffilter` presets (or "
        "`ffilter_custom` gain list) filter in rFFT space, `enhance_mode` "
        "applies blur/sharpen/contrast/saturate, `affect` picks whether "
        "effects hit each noise draw, the blended result, or both."),
    "SonarBlehOpsNoise": (
        "Rule-program transform of generated noise.",
        "`rules` is a YAML program (see sonar_tpu.noise.ops_engine for the "
        "documented schema) evaluated on every draw — the native equivalent "
        "of bleh's block-ops interpreter."),
    "KRestartSamplerCustomNoise": (
        "Restart sampling (full KSampler surface) with custom restart noise.",
        "Restart segments re-noise from t_min back to t_max `k` times and "
        "re-sample; jump noise comes from `custom_noise_opt`. `segments` "
        "accepts the `[n,k,t_min,t_max],...` mini-language. ComfyUI "
        "pipeline inputs (model/conds/schedule) don't apply — the returned "
        "callable takes (model, x, sigmas) directly."),
    "RestartSamplerCustomNoise": (
        "Restart sampling wrapper for an existing SAMPLER.",
        "Same restart mechanics as KRestartSamplerCustomNoise, wrapping the "
        "connected `sampler`."),
}


def _fmt_type(spec: dict) -> str:
    t = spec["t"]
    if t == "f":
        return "float"
    if t == "i":
        return "int"
    if t == "b":
        return "bool"
    if t == "s":
        return "string"
    if t == "tri":
        return "tri-state"
    if t == "enum":
        return "enum"
    if t == "dyn":
        return f"enum ({spec['dom']} registry)"
    return f"input ({spec.get('ty', '?')})"


def _fmt_constraints(spec: dict) -> str:
    t = spec["t"]
    if t in ("f", "i"):
        lo, hi = spec.get("lo"), spec.get("hi")
        if lo is None and hi is None:
            return ""
        return f"{lo} … {hi}"
    if t == "enum":
        return ", ".join(spec["opts"])
    if t == "tri":
        return "default / forced / disabled (or True/False/None)"
    if t == "dyn":
        extras = spec.get("extras")
        return f"+ {', '.join(extras)}" if extras else ""
    return ""


def _fmt_default(spec: dict):
    d = spec.get("d")
    return "" if d is None else f"`{d}`"


def main() -> None:
    lines = [
        "# Node reference",
        "",
        "Every reference node name maps to `sonar_tpu.api.nodes.build(name, "
        "**widgets)`. Parameters are validated against the reference schemas "
        "(unknown names, enum violations, and out-of-range values raise). "
        "This file is GENERATED — edit tools/gen_node_docs.py and rerun it.",
        "",
        "Tri-state parameters accept `default`/`forced`/`disabled` or "
        "`None`/`True`/`False`. Enum parameters marked `(X registry)` are "
        "validated against the live framework registry, so registered "
        "extensions stay valid.",
        "",
    ]
    for node in sorted(SCHEMAS):
        schema = SCHEMAS[node]
        summary, prose = DESC[node]
        lines += [f"## {node}", "", f"**{summary}**", "", prose, ""]
        adapt = ADAPT.get(node, {})
        removed = adapt.get("removed", {})
        lines += ["| parameter | type | default | constraints |",
                  "|---|---|---|---|"]
        for fname in sorted(schema, key=lambda k: (not schema[k].get("r"), k)):
            spec = schema[fname]
            if fname in removed:
                lines.append(
                    f"| ~~{fname}~~ | {_fmt_type(spec)} | | replaced — "
                    f"{removed[fname]} |")
                continue
            req = "**required**" if spec.get("r") and spec["t"] == "x" else ""
            cons = _fmt_constraints(spec) or req
            lines.append(
                f"| {fname} | {_fmt_type(spec)} | {_fmt_default(spec)} "
                f"| {cons} |")
        extra = adapt.get("extra", ())
        if extra == "*":
            lines += ["",
                      "Additional free-form parameters are forwarded to the "
                      "rule/config builder (YAML-style keys)."]
        elif extra:
            lines += ["",
                      "Framework extras: " + ", ".join(
                          f"`{e}`" for e in sorted(extra))]
        lines.append("")
    lines += [
        "",
        "## Scheduler nodes (native host-node implementations)",
        "",
        "These ComfyUI core / custom-sampling nodes build natively so ported",
        "workflows carry their sigma schedules (`sonar_tpu.samplers.get_sigmas`):",
        "",
        "| node | parameters | notes |",
        "|---|---|---|",
        "| `BasicScheduler` | `scheduler` (normal, sgm_uniform, karras, "
        "exponential, polyexponential, simple, ddim_uniform, beta, "
        "kl_optimal, linear_quadratic), `steps`, `denoise` | `model` link → "
        "`model_sampling`; `denoise < 1` keeps the final `steps` of a "
        "`steps/denoise` schedule |",
        "| `KarrasScheduler` | `steps`, `sigma_max`, `sigma_min`, `rho` | "
        "Karras et al. rho-ramp |",
        "| `ExponentialScheduler` | `steps`, `sigma_max`, `sigma_min` | "
        "log-linear ramp |",
        "| `PolyexponentialScheduler` | `steps`, `sigma_max`, `sigma_min`, "
        "`rho` | polynomial ramp in log-sigma |",
        "",
        "All return a descending `steps + 1` float32 array ending in 0.0; "
        "a ported",
        "workflow's schedule is `PortResult.sigmas`.",
    ]
    out = os.path.join(HERE, "..", "docs", "node_reference.md")
    with open(out, "w") as fp:
        fp.write("\n".join(lines))
    print(f"wrote {out}: {len(SCHEMAS)} nodes, {sum(1 for l in lines if l.startswith('|'))} table rows")


if __name__ == "__main__":
    main()
