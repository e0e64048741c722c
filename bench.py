"""Headline benchmark: Mask2Former (R-50, Mask2Anomaly heads) whole-image eval at
1024x2048 — images/sec/chip on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", dispersion...}.
Secondary diagnostics go to stderr with a 'DIAG ' prefix so they cannot be
mistaken for the headline by a last-JSON-line parser.

Baseline context: the reference publishes no throughput numbers (SURVEY.md §6). The
north-star target is >= 2x an A100 running the reference PyTorch eval path at
1024x2048; public Mask2Former R-50 semantic inference on A100-class GPUs runs ~5 FPS at
this resolution (fp32 deformable encoder, per-image Python post-processing), so the
target is 2 x 5 = 10 img/s/chip. ``vs_baseline`` = value / 10.0 (>= 1.0 means target
met). Set BENCH_MODEL=deeplab for the DeepLab v3+ (WRN-38) eval benchmark instead.

Headline mode: the production eval path uses APPROXIMATE nearest-corner
deformable sampling (``--sample_mode nearest`` in the test runner; round-5
J-MAJOR row order, same numerics as round 4's, PERF.md round 5),
accuracy-qualified END-TO-END on a trained checkpoint with paired-bootstrap
CIs (outputs/r5/m2f_evidence_ci{2,3}.json; the compact harness measures the
sub-pt deltas, the per-checkpoint release gate in tools/validate_release.py
re-adjudicates on real weights). The faster score_lowres / score_topq
inference tails were measured (+6.7% / +4.4%) but REFUSED by that same gate
at compact scale and are NOT in the headline — env knobs measure them. The
metric name carries the mode. The exact bilinear op (toolchain-bounded at
~6.8 img/s: 1.85 ns/index gather issue floor + XLA 4-pass roofline, PERF.md
round 3) is reported as a DIAG line. Set BENCH_DEFORM_MODE=bilinear to make
the exact op the headline.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

# Persistent compilation cache: the 1024x2048 eval programs take minutes to
# compile over the tunneled device transport; caching them makes repeat bench
# runs (and the driver's round-end run) compile-free.
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H, W = 1024, 2048
# throughput batching: DeepLab gains ~1.6x from batch 4 (conv-tail amortization);
# the gather-bound M2F is fastest at batch 1 (both measured on v5e).
_DEFAULT_BATCH = {"m2f": 1, "deeplab": 4}
BATCH = int(os.environ.get("BENCH_BATCH", "0"))
ITERS = 4  # per timed window
WINDOWS = 5  # best-of-N windows: the tunneled chip shows transient slow phases
# (r4 measured pattern: a transient first window then steady state — e.g.
# [0.91, 0.48, 0.47] s; two extra ~0.5 s windows materially improve the
# best-of estimator's chance of catching a clean phase at negligible cost)
TARGET_IMG_S = 10.0  # 2x estimated A100 reference throughput


def _noise_like(variables, img):
    """Noise input + perturbed params: a zeros image through a random-init bf16 model
    can let XLA shortcut degenerate fusions (all-False keep masks, zero-kernel heads);
    realistic-magnitude noise dodges constant-folding flattery."""
    img = jax.random.normal(jax.random.PRNGKey(1), img.shape, img.dtype)
    noise = jax.tree_util.tree_map(
        lambda p, k: p + 0.01 * jax.random.normal(k, p.shape, p.dtype),
        variables,
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(variables),
            list(jax.random.split(jax.random.PRNGKey(2),
                                  jax.tree_util.tree_structure(variables).num_leaves)),
        ),
    )
    return noise, img


def bench_m2f():
    from multishiftseg_tpu.models.maskformer import MaskFormer, inference

    # Default headline = the qualified approximate nearest sampling (see module
    # docstring); BENCH_DEFORM_MODE=bilinear measures the exact op instead.
    # BENCH_INT8=1 additionally stores the deformable value table in int8
    # (independently qualified; the two fast paths compose).
    mode_env = os.environ.get("BENCH_DEFORM_MODE", "nearest")
    # comma syntax = per-encoder-layer hybrid (same as test_runner --sample_mode)
    mode_val = (tuple(s.strip() for s in mode_env.split(","))
                if "," in mode_env else mode_env)
    model = MaskFormer(
        num_classes=19, backbone="resnet50", dtype=jnp.bfloat16,
        deform_sample_mode=mode_val,
        quantize_deform_table=os.environ.get("BENCH_INT8", "") == "1",
    )
    img = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 128, 256, 3)), train=False
    )
    variables, img = _noise_like(variables, img)

    # BENCH_SCORE_LOWRES=1: score the anomaly branch at mask resolution and
    # upsample the score map (REFUSED by the compact qualification gate,
    # outputs/r5/m2f_evidence_ci2.json — kept for measurement).
    # BENCH_SCORE_TOPQ=Q: upsample only the Q largest-mass OOD queries —
    # ALSO refused by the compact gate (AUPRC −1.2..−3.9 pt at matched 1/3
    # pruning ratio, outputs/r5/m2f_evidence_ci3.json: the miniature
    # checkpoint's query mass is not concentrated enough). Kept for
    # measurement and for per-checkpoint re-adjudication on real weights.
    score_lowres = os.environ.get("BENCH_SCORE_LOWRES", "") == "1"
    score_topq = int(os.environ.get("BENCH_SCORE_TOPQ", "0"))

    @jax.jit
    def fwd(variables, img):
        outputs = model.apply(variables, img, train=False)
        sem, anomaly = inference(outputs, img.shape[1:3],
                                 score_lowres=score_lowres,
                                 score_topq=score_topq)
        return anomaly

    # the metric name carries the sampling mode — an approximate number must
    # never masquerade as the exact op (and vice versa)
    mode = model.deform_sample_mode
    if isinstance(mode, tuple):  # hybrid: name carries the per-layer recipe
        mode = "hybrid_" + "_".join(mode)
    tag = "" if mode == "bilinear" else f"_approx_{mode}"
    if model.quantize_deform_table:
        tag += "_int8"
    if score_lowres:
        tag += "_lowres"
    if score_topq:
        tag += f"_topq{score_topq}"
    return f"m2f_r50{tag}_eval_1024x2048", fwd, variables, img


def bench_deeplab():
    from multishiftseg_tpu.models.deeplab import DeepWV3Plus

    model = DeepWV3Plus(num_classes=19, dtype=jnp.bfloat16)
    img = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 128, 256, 3)), train=False
    )
    variables, img = _noise_like(variables, img)

    @jax.jit
    def fwd(variables, img):
        score, logit = model.apply(variables, img, train=False)
        return score

    return "deeplab_wrn38_eval_1024x2048", fwd, variables, img


def run_one(which):
    global BATCH
    BATCH = int(os.environ.get("BENCH_BATCH", "0")) or _DEFAULT_BATCH.get(which, 1)
    name, fwd, variables, img = bench_deeplab() if which == "deeplab" else bench_m2f()

    # Warm until two consecutive warmup windows agree within 10% (bounded at 8):
    # a fixed 2-iter warmup leaves a post-compile-cache transient that lands in
    # the first timed window (BENCH_r04 recorded a 10.8 s window vs 0.48 steady),
    # wasting a window and inflating the full-range dispersion field.
    prev = None
    for _ in range(8):
        t0 = time.perf_counter()
        float(jnp.mean(fwd(variables, img)))
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) <= 0.10 * max(dt, prev):
            break
        prev = dt
    # Chain a data dependency through each iteration and finish with a host data read:
    # the device runtime can coalesce repeated identical dispatches, and
    # block_until_ready alone has been observed to return early over remote transports.
    sync_overhead = float("inf")
    for _ in range(3):  # min over tries: a single transport hiccup here would
        sync0 = time.perf_counter()  # otherwise swamp the timed window below
        float(jnp.mean(img))
        sync_overhead = min(sync_overhead, time.perf_counter() - sync0)
    # Best-of-WINDOWS min-time estimator: the tunneled device transport shows
    # transient multi-second slow phases (PERF.md round-3 variance note); the
    # fastest window is the honest steady-state number, per standard practice.
    windows = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        x = img
        for _ in range(ITERS):
            out = fwd(variables, x)
            x = img + jnp.mean(out).astype(img.dtype)
        float(jnp.mean(x))  # forces completion of the whole chain
        raw = time.perf_counter() - t0
        # the overhead correction must stay a correction; if it rivals the
        # window itself something hiccuped — keep the uncorrected time
        windows.append(raw - sync_overhead if sync_overhead < 0.25 * raw else raw)
    best = min(windows)
    img_per_s = ITERS * img.shape[0] / best

    return {
        "metric": f"{name}_images_per_sec_per_chip",
        "value": round(img_per_s, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / TARGET_IMG_S, 3),
        # dispersion: the tunneled chip shows ~25% day-scale slow phases
        # (PERF.md); the per-window times let a recorded number carry its own
        # error bar so regressions are attributable (code vs environment)
        "window_sec": [round(w, 4) for w in windows],
        "window_img_per_s": [round(ITERS * img.shape[0] / w, 3) for w in windows],
        "dispersion_pct": round(100.0 * (max(windows) - best) / best, 1),
        # The measured pattern is ONE transient slow first window then steady
        # state (e.g. [0.91, 0.48, 0.47] s), which makes the full-range
        # dispersion read ~80% even when steady state is tight. The
        # steady-state figure (range over windows excluding the single
        # slowest) is the error bar that matters for code-vs-environment
        # attribution; the full range stays recorded above.
        "steady_dispersion_pct": round(
            100.0 * (max(sorted(windows)[:-1]) - best) / best, 1)
        if len(windows) > 2 else round(100.0 * (max(windows) - best) / best, 1),
    }


def _diag(result):
    """Secondary diagnostics are prefixed so they can NEVER be mistaken for the
    headline: the driver parses the last JSON-parseable line of the MERGED
    stdout+stderr stream (BENCH_r03 recorded the nearest-mode diagnostic as the
    round's number — accidental flattery). A 'DIAG ' prefix makes the line
    non-JSON; only the one stdout headline parses."""
    print("DIAG " + json.dumps(result), file=sys.stderr, flush=True)


def main():
    # The flagship model (the one __graft_entry__.entry() declares) is Mask2Former;
    # its line is THE stdout JSON line. The DeepLab number goes to stderr as a
    # prefixed secondary diagnostic so the driver's one-line contract stays intact.
    which = os.environ.get("BENCH_MODEL", "m2f")
    if which == "both":
        _diag(run_one("deeplab"))
        which = "m2f"
    # the headline line goes out FIRST (and flushed): compiles on the tunneled
    # chip can take minutes, and a driver-side timeout must not lose the one
    # stdout line to a pending secondary diagnostic
    print(json.dumps(run_one(which)), flush=True)
    if which == "m2f" and os.environ.get("BENCH_DEFORM_MODE", "") == "":
        # secondary diagnostic: the EXACT bilinear reference-parity op
        # (toolchain-bounded ~6.8 img/s ceiling, PERF.md round 3); the stdout
        # headline is the qualified approximate nearest path (module docstring).
        os.environ["BENCH_DEFORM_MODE"] = "bilinear"
        _diag(run_one("m2f"))


if __name__ == "__main__":
    main()
