"""Golden end-to-end parity: our flax Mask2Former head stack vs the reference torch
modules, with the REAL shipped hyperparameters (conv_dim 256, 6 encoder layers, 9 GMA
decoder layers, 100 queries) on tiny spatial shapes, random weights converted through
``convert_maskformer``, fp32 CPU.

Covers the composition bugs component oracles can't catch: attn-mask threshold order,
level round-robin, the aux-outputs zip truncation quirk
(``mask2former_transformer_decoder.py:438-573``), pixel-decoder FPN step
(``msdeformattn.py:314-358``), and the eval-path semantic/anomaly inference math
(``maskformer_model.py:341-354``, ``train_m2f.py:387-407``).

The reference modules are loaded leaf-first with fake parent packages (skipping the
heavy ``mask2former/__init__``) and minimal detectron2/fvcore stubs; the deformable op
runs its pure-torch ``grid_sample`` fallback.
"""

import importlib
import sys
import types

import numpy as np
import pytest

M2F_DIR = "/root/reference/lib/network/mask2former"

# real shipped config (anomaly_ft.yaml + Base-Cityscapes yaml)
CONV_DIM = 256
MASK_DIM = 256
NHEADS = 8
ENC_LAYERS = 6
DEC_LAYERS = 9  # DEC_LAYERS(10) - 1
NUM_QUERIES = 100
NUM_CLASSES = 19
# tiny spatial extent: image 64x96 -> strides 4/8/16/32
FEAT_SHAPES = {"res2": (256, 16, 24), "res3": (512, 8, 12),
               "res4": (1024, 4, 6), "res5": (2048, 2, 3)}
IMG_HW = (64, 96)


def _stub_module(name):
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real (non-None) spec: importlib.util.find_spec raises ValueError on
    # modules with __spec__ None, which breaks later availability probes
    # (e.g. transformers checking for torchvision) in suite-order runs
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    import torch
    from torch import nn

    if "fvcore.nn.weight_init" not in sys.modules:
        fv = _stub_module("fvcore")
        fvnn = _stub_module("fvcore.nn")
        wi = _stub_module("fvcore.nn.weight_init")
        wi.c2_xavier_fill = lambda m: None
        wi.c2_msra_fill = lambda m: None
        fv.nn = fvnn
        fvnn.weight_init = wi

    if "detectron2" in sys.modules:
        return

    _stub_module("detectron2")
    cfgm = _stub_module("detectron2.config")
    cfgm.configurable = lambda f: f  # direct-kwarg construction passthrough

    layers = _stub_module("detectron2.layers")

    class ShapeSpec:
        def __init__(self, channels=None, height=None, width=None, stride=None):
            self.channels, self.height = channels, height
            self.width, self.stride = width, stride

    class Conv2d(nn.Conv2d):
        def __init__(self, *args, norm=None, activation=None, **kwargs):
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    def get_norm(norm, out_channels):
        if not norm:
            return None
        if norm == "GN":
            return nn.GroupNorm(32, out_channels)
        raise ValueError(norm)

    layers.Conv2d = Conv2d
    layers.ShapeSpec = ShapeSpec
    layers.get_norm = get_norm
    layers.DeformConv = type("DeformConv", (), {})  # imported by fpn.py, unused

    _stub_module("detectron2.utils")
    regm = _stub_module("detectron2.utils.registry")

    class Registry:
        def __init__(self, name):
            self._m = {}

        def register(self, obj=None):
            if obj is None:
                def deco(o):
                    self._m[o.__name__] = o
                    return o
                return deco
            self._m[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._m[name]

    regm.Registry = Registry

    modeling = _stub_module("detectron2.modeling")
    modeling.SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
    modeling.META_ARCH_REGISTRY = Registry("META_ARCH")
    modeling.BACKBONE_REGISTRY = Registry("BACKBONE")
    modeling.build_backbone = lambda cfg: None
    modeling.build_sem_seg_head = lambda cfg, shape: None
    backbone_m = _stub_module("detectron2.modeling.backbone")
    backbone_m.Backbone = type("Backbone", (), {})
    modeling.Backbone = backbone_m.Backbone
    modeling.ShapeSpec = ShapeSpec
    post_m = _stub_module("detectron2.modeling.postprocessing")
    post_m.sem_seg_postprocess = lambda *a, **k: None
    structures = _stub_module("detectron2.structures")
    for cls_name in ("Boxes", "ImageList", "Instances", "BitMasks"):
        setattr(structures, cls_name, type(cls_name, (), {}))
    mem_m = _stub_module("detectron2.utils.memory")
    mem_m.retry_if_cuda_oom = lambda f: f
    comm_m = _stub_module("detectron2.utils.comm")
    comm_m.get_world_size = lambda: 1
    data_m = _stub_module("detectron2.data")
    data_m.MetadataCatalog = types.SimpleNamespace(get=lambda name: None)
    _stub_module("detectron2.projects")
    pr_m = _stub_module("detectron2.projects.point_rend")
    pf_m = _stub_module("detectron2.projects.point_rend.point_features")
    pf_m.point_sample = lambda *a, **k: None
    pf_m.get_uncertain_point_coords_with_randomness = lambda *a, **k: None
    pr_m.point_features = pf_m

    # the compiled CUDA extension: dummy module so the functions/__init__ import
    # succeeds; the AttributeError at call time routes to the pure-torch fallback
    # (ms_deform_attn.py:116-121)
    _stub_module("MultiScaleDeformableAttention")

    tv = _stub_module("torchvision")  # utils/misc.py imports it for a version check
    tv.__version__ = "0.15"

    if "easydict" not in sys.modules:
        ed = _stub_module("easydict")

        class EasyDict(dict):
            __getattr__ = dict.get
            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict

    # lib.configs.config imported by criterion.py:20 (module-level `config` edict).
    # Don't clobber a real `lib` package another test may have imported.
    if "lib" not in sys.modules:
        lib_m = _stub_module("lib")
        lib_m.__path__ = ["/root/reference/lib"]
    if "lib.configs" not in sys.modules:
        cfgs = _stub_module("lib.configs")
        cfgs.__path__ = ["/root/reference/lib/configs"]
    if "lib.configs.config" not in sys.modules:
        libcfg = _stub_module("lib.configs.config")
        ED = sys.modules["easydict"].EasyDict
        libcfg.config = ED({"data": ED({"generated_subdir_names": []})})


def _fake_pkg(name, path):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod


def _load(modname):
    _fake_pkg("refm2f", M2F_DIR)
    _fake_pkg("refm2f.modeling", M2F_DIR + "/modeling")
    _fake_pkg("refm2f.modeling.pixel_decoder", M2F_DIR + "/modeling/pixel_decoder")
    _fake_pkg("refm2f.modeling.transformer_decoder",
              M2F_DIR + "/modeling/transformer_decoder")
    return importlib.import_module(modname)


@pytest.fixture(scope="module")
def torch_side():
    import torch

    _install_stubs()
    pd_mod = _load("refm2f.modeling.pixel_decoder.msdeformattn")
    dec_mod = _load("refm2f.modeling.transformer_decoder.mask2former_transformer_decoder")
    mf_mod = _load("refm2f.maskformer_model")
    ShapeSpec = sys.modules["detectron2.layers"].ShapeSpec

    torch.manual_seed(0)
    input_shape = {
        k: ShapeSpec(channels=c, stride=s)
        for (k, (c, _, _)), s in zip(FEAT_SHAPES.items(), (4, 8, 16, 32))
    }
    pd = pd_mod.MSDeformAttnPixelDecoder(
        input_shape=input_shape, transformer_dropout=0.0, transformer_nheads=NHEADS,
        transformer_dim_feedforward=1024, transformer_enc_layers=ENC_LAYERS,
        conv_dim=CONV_DIM, mask_dim=MASK_DIM, norm="GN",
        transformer_in_features=["res3", "res4", "res5"], common_stride=4,
    )
    dec = dec_mod.MultiScaleMaskedTransformerDecoder_GMA(
        in_channels=CONV_DIM, num_classes=NUM_CLASSES, hidden_dim=CONV_DIM,
        num_queries=NUM_QUERIES, nheads=NHEADS, dim_feedforward=2048,
        dec_layers=DEC_LAYERS, pre_norm=False, mask_dim=MASK_DIM,
        enforce_input_project=False,
    )
    # bias a mid-range class up so semantic_inference's high-confidence concat
    # (scores > 0.95 & 1 < label < 11) actually triggers with random weights
    with torch.no_grad():
        dec.class_embed.bias[5] += 8.0
    pd.eval()
    dec.eval()

    rng = np.random.RandomState(1)
    feats = {
        k: (rng.randn(1, c, h, w) * 0.5).astype(np.float32)
        for k, (c, h, w) in FEAT_SHAPES.items()
    }
    with torch.no_grad():
        mask_feat_t, top_t, ms_t = pd.forward_features(
            {k: torch.from_numpy(v) for k, v in feats.items()}
        )
        out_t = dec(ms_t, mask_feat_t)
    return types.SimpleNamespace(
        pd=pd, dec=dec, mf_mod=mf_mod, feats=feats,
        mask_feat=mask_feat_t, multi_scale=ms_t, out=out_t,
    )


@pytest.fixture(scope="module")
def jax_out(torch_side):
    from multishiftseg_tpu.convert.torch2jax import convert_maskformer
    from multishiftseg_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
    from multishiftseg_tpu.models.transformer_decoder import (
        MultiScaleMaskedTransformerDecoderGMA,
    )

    sd = {}
    for k, v in torch_side.pd.state_dict().items():
        sd[f"sem_seg_head.pixel_decoder.{k}"] = v
    for k, v in torch_side.dec.state_dict().items():
        sd[f"sem_seg_head.predictor.{k}"] = v
    variables = convert_maskformer(sd, dec_layers=DEC_LAYERS)

    feats_nhwc = {
        k: v.transpose(0, 2, 3, 1) for k, v in torch_side.feats.items()
    }
    pdj = MSDeformAttnPixelDecoder(
        conv_dim=CONV_DIM, mask_dim=MASK_DIM, transformer_enc_layers=ENC_LAYERS,
        n_heads=NHEADS,
    )
    mask_feat_j, top_j, ms_j = pdj.apply(
        {"params": variables["params"]["pixel_decoder"]}, feats_nhwc
    )
    decj = MultiScaleMaskedTransformerDecoderGMA(
        num_classes=NUM_CLASSES, hidden_dim=CONV_DIM, num_queries=NUM_QUERIES,
        nheads=NHEADS, dim_feedforward=2048, dec_layers=DEC_LAYERS,
        mask_dim=MASK_DIM,
    )
    out_j = decj.apply(
        {"params": variables["params"]["predictor"]}, ms_j, mask_feat_j
    )
    return types.SimpleNamespace(mask_feat=mask_feat_j, multi_scale=ms_j, out=out_j)


def _close(ours, theirs, atol=2e-3, rtol=1e-3):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), theirs.detach().numpy(), atol=atol, rtol=rtol
    )


def test_pixel_decoder_parity(torch_side, jax_out):
    _close(np.transpose(np.asarray(jax_out.mask_feat), (0, 3, 1, 2)),
           torch_side.mask_feat)
    for ours, theirs in zip(jax_out.multi_scale, torch_side.multi_scale):
        _close(np.transpose(np.asarray(ours), (0, 3, 1, 2)), theirs)


def test_gma_decoder_parity(torch_side, jax_out):
    for key in ("pred_logits", "pred_masks", "pred_logits_ood", "pred_masks_ood"):
        _close(jax_out.out[key], torch_side.out[key])


def test_aux_outputs_parity(torch_side, jax_out):
    """The aux list must reproduce the reference's zip-truncation quirk
    (dec_layers-1 entries; entry i pairs pre-layer-i class with post-layer-(i+1)
    ood head, mask2former_transformer_decoder.py:565-573)."""
    aux_t, aux_j = torch_side.out["aux_outputs"], jax_out.out["aux_outputs"]
    assert len(aux_t) == DEC_LAYERS - 1
    assert len(aux_j) == len(aux_t)
    for a_j, a_t in zip(aux_j, aux_t):
        assert set(a_j) == set(a_t)
        for key in a_t:
            _close(a_j[key], a_t[key])


def test_inference_parity(torch_side, jax_out):
    """Eval path: upsample + Mask2Anomaly semantic inference (high-confidence mask
    concat) + OOD anomaly score vs the reference math."""
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp

    from multishiftseg_tpu.models.maskformer import inference

    sem_j, anomaly_j = inference(jax_out.out, IMG_HW)

    out_t = torch_side.out
    with torch.no_grad():
        masks_up = F.interpolate(out_t["pred_masks"], size=IMG_HW, mode="bilinear",
                                 align_corners=False)
        fake_self = types.SimpleNamespace(
            sem_seg_head=types.SimpleNamespace(num_classes=NUM_CLASSES)
        )
        semseg_t = torch_side.mf_mod.MaskFormer.semantic_inference(
            fake_self, out_t["pred_logits"][0], masks_up[0]
        )
        # anomaly oracle = TrainM2FOOD.get_anomaly_score (train_m2f.py:387-407)
        cls_ood = out_t["pred_logits_ood"]
        masks_ood_up = F.interpolate(out_t["pred_masks_ood"], size=IMG_HW,
                                     mode="bilinear", align_corners=False)
        probs = F.softmax(cls_ood, dim=-1)[..., :-1]
        unc = torch.einsum("bqc,bqhw->bchw", probs, masks_ood_up.sigmoid())
        anomaly_t = 1 - unc.max(dim=1)[0]

    # first 19 channels: dense semantic logits
    np.testing.assert_allclose(np.asarray(sem_j[0, :NUM_CLASSES]),
                               semseg_t[:NUM_CLASSES].numpy(), atol=2e-3, rtol=1e-3)
    # extra channels: reference appends only kept queries; ours keeps all Q slots
    # (zeros for dropped) — rebuild the dense layout for comparison
    probs_full = torch.softmax(out_t["pred_logits"][0], dim=-1)
    scores, labels = probs_full.max(-1)
    keep = (labels != NUM_CLASSES) & (scores > 0.95) & (labels < 11) & (labels > 1)
    assert bool(keep.any()), "high-confidence branch not exercised"
    dense_t = np.zeros((NUM_QUERIES,) + IMG_HW, np.float32)
    dense_t[keep.numpy()] = semseg_t[NUM_CLASSES:].numpy()
    np.testing.assert_allclose(np.asarray(sem_j[0, NUM_CLASSES:]), dense_t,
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(anomaly_j[0]), anomaly_t[0].numpy(),
                               atol=2e-3, rtol=1e-3)


def test_inference_score_lowres(rng):
    """The low-res anomaly fast path (score at mask resolution, upsample the
    score map): same output shape, EXACT on spatially-constant masks (where
    sigmoid commutes with resize), and close to the exact path on smooth
    mask logits (the boundary-softening approximation it trades on)."""
    import jax.numpy as jnp

    from multishiftseg_tpu.models.maskformer import inference

    B, Q, h, w = 1, 5, 16, 32
    hw_out = (64, 128)
    logits = rng.randn(B, Q, NUM_CLASSES + 1).astype(np.float32)

    # spatially constant masks -> resize is exact -> paths identical
    const = np.broadcast_to(
        rng.randn(B, Q, 1, 1).astype(np.float32), (B, Q, h, w)).copy()
    out_const = {
        "pred_masks": jnp.asarray(const), "pred_logits": jnp.asarray(logits),
        "pred_masks_ood": jnp.asarray(const),
        "pred_logits_ood": jnp.asarray(logits),
    }
    _, a_exact = inference(out_const, hw_out, num_classes=NUM_CLASSES)
    _, a_low = inference(out_const, hw_out, num_classes=NUM_CLASSES,
                         score_lowres=True)
    assert a_low.shape == a_exact.shape
    np.testing.assert_allclose(np.asarray(a_low), np.asarray(a_exact),
                               atol=1e-5, rtol=1e-5)

    # smooth masks: approximate but close (mean |delta| well under the score's
    # dynamic range; the delta concentrates at mask boundaries)
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    smooth = np.stack([np.sin(gy / 4 + q) + np.cos(gx / 6 - q)
                       for q in range(Q)])[None] * 2.0
    out_smooth = {
        "pred_masks": jnp.asarray(smooth), "pred_logits": jnp.asarray(logits),
        "pred_masks_ood": jnp.asarray(smooth),
        "pred_logits_ood": jnp.asarray(logits),
    }
    _, a_exact = inference(out_smooth, hw_out, num_classes=NUM_CLASSES)
    _, a_low = inference(out_smooth, hw_out, num_classes=NUM_CLASSES,
                         score_lowres=True)
    diff = np.abs(np.asarray(a_low) - np.asarray(a_exact))
    assert diff.mean() < 0.01, diff.mean()


def test_inference_score_topq(rng):
    """Query pruning: topq >= Q is exact (all queries kept, order-invariant
    sum); topq < Q with the mass concentrated on few queries is exact too
    (dropped queries carry ~zero non-void probability)."""
    import jax.numpy as jnp

    from multishiftseg_tpu.models.maskformer import inference

    B, Q, h, w = 1, 8, 8, 16
    hw_out = (32, 64)
    masks = rng.randn(B, Q, h, w).astype(np.float32)
    logits = rng.randn(B, Q, NUM_CLASSES + 1).astype(np.float32)
    out = {"pred_masks": jnp.asarray(masks), "pred_logits": jnp.asarray(logits),
           "pred_masks_ood": jnp.asarray(masks),
           "pred_logits_ood": jnp.asarray(logits)}
    _, a_exact = inference(out, hw_out, num_classes=NUM_CLASSES)
    _, a_full = inference(out, hw_out, num_classes=NUM_CLASSES, score_topq=Q)
    np.testing.assert_allclose(np.asarray(a_full), np.asarray(a_exact),
                               atol=1e-5, rtol=1e-5)

    # concentrate the non-void mass on 3 queries: the rest predict void
    conc = np.full((B, Q, NUM_CLASSES + 1), -10.0, np.float32)
    conc[..., NUM_CLASSES] = 10.0  # all-void...
    for q in range(3):  # ...except three confident object queries
        conc[0, q, q] = 20.0
    out2 = dict(out, pred_logits_ood=jnp.asarray(conc))
    _, a_exact2 = inference(out2, hw_out, num_classes=NUM_CLASSES)
    _, a_top3 = inference(out2, hw_out, num_classes=NUM_CLASSES, score_topq=3)
    np.testing.assert_allclose(np.asarray(a_top3), np.asarray(a_exact2),
                               atol=1e-4, rtol=1e-4)
