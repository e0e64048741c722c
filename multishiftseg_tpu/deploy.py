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


_META_PREFIX = "__meta__" + _SEP


def _flat_key(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", getattr(p, "name", None)))
        key = str(key)
        # '/' inside a collection/param name would be re-split into extra
        # nesting levels by load_pytree_npz, silently reshaping the tree and
        # failing only at exported.call time — refuse it at save time
        if _SEP in key:
            raise ValueError(
                f"pytree path component {key!r} contains {_SEP!r}; "
                "flat npz keys cannot round-trip it")
        parts.append(key)
    return _SEP.join(parts)


def save_pytree_npz(tree, path: str, meta: Optional[dict] = None) -> None:
    """Flatten a (nested-dict) pytree of arrays to a compressed ``.npz``.

    ``meta``: optional flat dict of small arrays written under the reserved
    ``__meta__/`` prefix (e.g. input normalization constants); ignored by
    :func:`load_pytree_npz`, read back by :func:`load_npz_meta`.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrs = {_flat_key(p): np.asarray(v) for p, v in flat}
    for k, v in (meta or {}).items():
        arrs[_META_PREFIX + k] = np.asarray(v)
    np.savez_compressed(path, **arrs)


def load_pytree_npz(path: str):
    """Rebuild the nested-dict pytree written by :func:`save_pytree_npz`."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            if key.startswith(_META_PREFIX):
                continue
            node = out
            *parents, leaf = key.split(_SEP)
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = jnp.asarray(z[key])
    return out


def load_npz_meta(path: str) -> dict:
    """Read the reserved ``__meta__/`` entries written beside the weights."""
    with np.load(path) as z:
        return {k[len(_META_PREFIX):]: np.asarray(z[k])
                for k in z.files if k.startswith(_META_PREFIX)}


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
        self.meta = load_npz_meta(artifact_prefix + ".npz")
        # in_avals = (variables..., img); img is the last flat aval
        self.input_shape = tuple(self.exported.in_avals[-1].shape)

    def __call__(self, img: np.ndarray):
        """img: [N, H, W, 3] float32 RGB in [0, 1] (raw, NOT pre-normalized:
        artifacts written by ``export_model`` bake the training mean/std
        normalization into the program — the constants travel in the npz under
        ``__meta__/input_{mean,std}`` for provenance). N <= exported batch,
        H/W <= exported H/W. Returns (anomaly [N, H, W], sem or None) cropped
        to the input."""
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
    given static bucket shape, and write the two serving artifacts.

    The eval pipeline's input normalization (``OODEvaluator._transform``:
    ``Normalize(cfg.data.mean, cfg.data.std)``) is BAKED into the exported
    program — a server with only jax installed has no config system to recover
    the constants from, so the artifact must be self-contained: it takes raw
    [0, 1] images. The constants are also written to the npz under
    ``__meta__/input_{mean,std}`` for provenance.
    """
    import os

    # the MSS_DEBUG_BOUNDS gather/scatter check is a jax.debug.callback — host
    # callbacks cannot serialize, and the failure would otherwise surface as a
    # cryptic error deep inside exported.serialize()
    if os.environ.get("MSS_DEBUG_BOUNDS") == "1":
        raise RuntimeError(
            "export_model cannot serialize with MSS_DEBUG_BOUNDS=1: the debug "
            "bounds check is a host callback (jax.debug.callback), which "
            "jax.export cannot serialize. Unset MSS_DEBUG_BOUNDS and re-run.")

    from .train import test_runner as tr

    mean = jnp.asarray(cfg.data.mean, jnp.float32)
    std = jnp.asarray(cfg.data.std, jnp.float32)

    if model == "deeplab":
        from .train.deeplab_trainer import TrainDeepLabOOD

        trainer = TrainDeepLabOOD(cfg, weight_path)

        def fwd(variables, img):
            img = (img - mean) / std
            score, logit = trainer.model.apply(variables, img, train=False)
            return score, logit.transpose(0, 3, 1, 2)

    else:
        from .models.maskformer import inference
        from .train.m2f_trainer import TrainM2FOOD

        trainer = TrainM2FOOD(cfg, weight_path)
        num_classes = trainer.model.num_classes

        def fwd(variables, img):
            img = (img - mean) / std
            outputs = trainer.model.apply(variables, img, train=False)
            sem, anomaly = inference(outputs, img.shape[1:3],
                                     num_classes=num_classes)
            return anomaly, sem

    bh, bw = tr.bucket_shape(height, width)
    exported = export_forward(fwd, trainer.variables, (batch, bh, bw, 3),
                              platforms=platforms)
    save_exported(exported, out_prefix + ".stablehlo")
    save_pytree_npz(trainer.variables, out_prefix + ".npz",
                    meta={"input_mean": np.asarray(cfg.data.mean, np.float32),
                          "input_std": np.asarray(cfg.data.std, np.float32),
                          "normalization_baked": np.asarray(1, np.int32)})
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
