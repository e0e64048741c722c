"""Spatial-sharding latency characterization (VERDICT r4 #3).

Measures single-image eval latency of the flagship M2F forward with the image
height-sharded over an N-device mesh (``test_runner.spatial_jit``; the
``--spatial N`` production surface), against the unsharded program.

Two run modes:

* default (CPU, 8 virtual devices): the SCALING TREND at a reduced resolution
  — how the partitioned program's wall time moves with mesh rows 1/2/4/8.
  On this one-physical-core host the virtual devices timeshare, so the trend
  measures partitioning OVERHEAD (resharding, halo, per-shard launch), not
  real speedup — the honest quantity a 1-core box can produce: if overhead
  is flat, real chips (which add real parallel compute) get the win.
* ``--tpu``: the attached single chip — spatial=1 (height-"sharded" over a
  1-device mesh) vs the plain unsharded jit at the benchmark resolution:
  the sharding machinery's overhead on real hardware at mesh size 1.

Prints one JSON line; also writes --out.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build(model_hw, n_classes=19):
    import jax
    import jax.numpy as jnp

    from multishiftseg_tpu.models.maskformer import MaskFormer, inference

    model = MaskFormer(num_classes=n_classes, backbone="resnet50",
                       dtype=jnp.bfloat16, deform_sample_mode="nearest")
    img = jnp.zeros((1,) + model_hw + (3,), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 128, 256, 3)),
        train=False)

    def fwd(vs, im):
        outputs = model.apply(vs, im, train=False)
        sem, anomaly = inference(outputs, im.shape[1:3])
        return anomaly

    return fwd, variables, img


def timeit(fn, *args, iters=3, reps=3):
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.mean(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="real-chip mode: spatial=1 vs unsharded at 1024x2048")
    ap.add_argument("--hw", type=int, nargs=2, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import os

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    else:
        from multishiftseg_tpu.utils import enable_compilation_cache

        enable_compilation_cache()

    from multishiftseg_tpu.train.test_runner import spatial_jit

    hw = tuple(args.hw) if args.hw else ((1024, 2048) if args.tpu
                                         else (256, 512))
    fwd, variables, img = build(hw)
    out = {"hw": list(hw), "platform": "tpu" if args.tpu else "cpu8",
           "sample_mode": "nearest", "latency_ms": {}}

    import jax.numpy as jnp

    jf = jax.jit(fwd)
    out["latency_ms"]["unsharded"] = round(
        1e3 * timeit(lambda im: jf(variables, im), img), 1)
    rows_list = [1] if args.tpu else [1, 2, 4, 8]
    for rows in rows_list:
        wrapped = spatial_jit(fwd, variables, rows, min_stride=32)
        out["latency_ms"][f"spatial_{rows}"] = round(
            1e3 * timeit(wrapped, img), 1)

    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
