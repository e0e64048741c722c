"""Deployment: ahead-of-time export of the eval forwards via ``jax.export``.

The reference has no serving story — its ``test_deeplab.py``/``test_m2f.py``
scripts rebuild the full torch model tree in-process every run. For production
serving the TPU-native framework instead serializes the jitted eval program to
a StableHLO artifact that a serving process loads and executes with ONLY jax
installed — no flax module tree, no config system, no model-zoo imports, and a
compile that is reproducible byte-for-byte from the artifact. Weights travel
beside the program as a flat ``.npz`` (kept out of the program so XLA never
captures the parameter tree as multi-GB literal constants — see PERF.md's
ControlNet captured-constant lesson).

Artifacts are lowered for an explicit platform set (default: the attached
backend; ``--platforms cpu tpu`` builds one artifact that serves both a TPU
fleet and CPU canaries). Shapes are static by design — serving uses the same
padded /128 eval buckets as ``train/test_runner.py``, so one artifact per
bucket and zero recompiles in steady state.

Produces/consumes:
  <out>.stablehlo   serialized ``jax.export.Exported`` program
  <out>.npz         flat weight archive (keys = '/'-joined pytree paths)

CLI:
  python -m multishiftseg_tpu.deploy --model m2f --cfg exps/m2f.yaml \
      --weight_path ckpt.pth --height 1024 --width 2048 --out m2f_1024x2048
"""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

_SEP = "/"


def _flat_key(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", getattr(p, "name", None)))
        parts.append(str(key))
    return _SEP.join(parts)


def save_pytree_npz(tree, path: str) -> None:
    """Flatten a (nested-dict) pytree of arrays to a compressed ``.npz``."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    np.savez_compressed(path, **{_flat_key(p): np.asarray(v) for p, v in flat})


def load_pytree_npz(path: str):
    """Rebuild the nested-dict pytree written by :func:`save_pytree_npz`."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            *parents, leaf = key.split(_SEP)
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = jnp.asarray(z[key])
    return out


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree)


def export_forward(fwd, variables, input_shape: Tuple[int, ...],
                   platforms: Optional[Sequence[str]] = None):
    """Export ``fwd(variables, img)`` as a ``jax.export.Exported`` program.

    ``variables`` stays a runtime argument (not a baked constant): the
    artifact is weight-agnostic, so one program serves every fine-tune of the
    same architecture and the StableHLO blob stays small (KBs, not GBs).

    Host callbacks cannot serialize — export with ``MSS_DEBUG_BOUNDS`` unset
    (its production default); the debug bounds check is a ``jax.debug.callback``.
    """
    from jax import export as jexport

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(fwd), **kwargs)(
        _abstract(variables), jax.ShapeDtypeStruct(input_shape, jnp.float32))


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


class ServingModel:
    """A loaded serving artifact: program + weights, callable on images.

    Needs only jax — reconstructs nothing from the model zoo. ``__call__``
    pads the batch to the exported static shape and crops outputs back, the
    same bucket discipline as ``OODEvaluator.test``.
    """

    def __init__(self, artifact_prefix: str):
        self.exported = load_exported(artifact_prefix + ".stablehlo")
        self.variables = load_pytree_npz(artifact_prefix + ".npz")
        # in_avals = (variables..., img); img is the last flat aval
        self.input_shape = tuple(self.exported.in_avals[-1].shape)

    def __call__(self, img: np.ndarray):
        """img: [N, H, W, 3] float32, N <= exported batch, H/W <= exported
        H/W. Returns (anomaly [N, H, W], sem or None) cropped to the input."""
        n, h, w = img.shape[:3]
        bn, bh, bw = self.input_shape[:3]
        if n > bn or h > bh or w > bw:
            raise ValueError(f"input {img.shape} exceeds exported {self.input_shape}")
        buf = np.zeros(self.input_shape, np.float32)
        buf[:n, :h, :w] = img
        anomaly, sem = self.exported.call(self.variables, jnp.asarray(buf))
        anomaly = np.asarray(anomaly, np.float32)[:n, :h, :w]
        if sem is not None:
            sem = np.asarray(sem, np.float32)[:n, :, :h, :w]
        return anomaly, sem


def export_model(model: str, cfg, weight_path: Optional[str], out_prefix: str,
                 height: int, width: int, batch: int = 1,
                 platforms: Optional[Sequence[str]] = None) -> str:
    """Build the eval forward exactly as the test runner does, export it at the
    given static bucket shape, and write the two serving artifacts."""
    from .train import test_runner as tr

    if model == "deeplab":
        from .train.deeplab_trainer import TrainDeepLabOOD

        trainer = TrainDeepLabOOD(cfg, weight_path)

        def fwd(variables, img):
            score, logit = trainer.model.apply(variables, img, train=False)
            return score, logit.transpose(0, 3, 1, 2)

    else:
        from .models.maskformer import inference
        from .train.m2f_trainer import TrainM2FOOD

        trainer = TrainM2FOOD(cfg, weight_path)
        num_classes = trainer.model.num_classes

        def fwd(variables, img):
            outputs = trainer.model.apply(variables, img, train=False)
            sem, anomaly = inference(outputs, img.shape[1:3],
                                     num_classes=num_classes)
            return anomaly, sem

    bh, bw = tr.bucket_shape(height, width)
    exported = export_forward(fwd, trainer.variables, (batch, bh, bw, 3),
                              platforms=platforms)
    save_exported(exported, out_prefix + ".stablehlo")
    save_pytree_npz(trainer.variables, out_prefix + ".npz")
    log.info("exported %s @ (%d, %d, %d, 3) for %s -> %s.{stablehlo,npz}",
             model, batch, bh, bw, exported.platforms, out_prefix)
    return out_prefix


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=["deeplab", "m2f"], required=True)
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--id", default="deploy")
    parser.add_argument("--weight_path", default=None)
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--width", type=int, default=2048)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="lowering platforms, e.g. --platforms cpu tpu "
                             "(default: the attached backend)")
    parser.add_argument("--out", required=True, help="artifact path prefix")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    from .core.config import load_config

    cfg = load_config(args.cfg, args.id)
    export_model(args.model, cfg, args.weight_path, args.out,
                 args.height, args.width, args.batch, args.platforms)


if __name__ == "__main__":
    main()
