"""Device-trace breakdown of the M2F eval forward at 1024x2048 (batch 1, bf16).

Writes a per-category table (gather / conv / matmul / scatter / other fusions) from
the jax.profiler device trace — the evidence base for PERF.md's gather-wall numbers.

Usage: python tools/profile_m2f.py [out_dir]
"""

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def run_traced(trace_dir: str, fwd, *args, iters: int = 3):
    # warmup / compile
    jax.block_until_ready(fwd(*args))
    with jax.profiler.trace(trace_dir):
        x = None
        for _ in range(iters):
            x = fwd(*args)
        jax.block_until_ready(x)
        float(jnp.mean(x[1] if isinstance(x, tuple) else x))


def parse_trace(trace_dir: str, iters: int):
    from tracing import load_device_events  # the one shared trace parser

    busy = defaultdict(float)
    names = defaultdict(float)
    total = 0.0
    for name, cat, dur in load_device_events(trace_dir):
        # keep uncategorized fusions in the busy total (XLA leaves some
        # custom fusions uncategorized; dropping them undercounts)
        if not cat and not name.startswith("fusion"):
            continue
        total += dur
        busy[cat or "uncategorized"] += dur
        names[f"{cat}::{name.split('.')[0]}"] += dur
    per_iter = total / iters
    print(f"\ndevice busy total: {total:.1f} ms over {iters} iters -> {per_iter:.1f} ms/iter")
    print("\nby hlo_category (ms/iter):")
    for k, v in sorted(busy.items(), key=lambda kv: -kv[1]):
        print(f"  {k:40s} {v / iters:9.2f}")
    print("\ntop ops (ms/iter):")
    for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {k:70s} {v / iters:9.2f}")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/m2f_trace"
    from multishiftseg_tpu.models.maskformer import MaskFormer, inference

    # MSS_PROFILE_MODE selects the deformable sampling mode (default = the
    # exact bilinear op; "nearest" = the promoted production fast path) so the
    # trace breakdown matches the program PERF.md's headline describes.
    import os

    mode = os.environ.get("MSS_PROFILE_MODE", "bilinear")
    model = MaskFormer(num_classes=19, backbone="resnet50", dtype=jnp.bfloat16,
                      deform_sample_mode=mode)
    img = jnp.zeros((1, 1024, 2048, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 128, 256, 3)), train=False
    )
    from bench import _noise_like

    variables, img = _noise_like(variables, img)

    lowres = os.environ.get("MSS_PROFILE_LOWRES", "") == "1"

    @jax.jit
    def fwd(variables, img):
        outputs = model.apply(variables, img, train=False)
        sem, anomaly = inference(outputs, img.shape[1:3],
                                 score_lowres=lowres)
        return anomaly

    iters = 3
    run_traced(out, fwd, variables, img, iters=iters)
    parse_trace(out, iters)


if __name__ == "__main__":
    main()
