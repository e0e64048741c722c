"""CG-Aug real backends: seg-conditioned diffusion (train + DDIM sample) and the
promptable segmenter (train + box prompting), plus the full generation pipeline
running through real (tiny) models instead of stubs."""

import numpy as np
import optax
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from multishiftseg_tpu.cgaug.diffusion import (
    JaxSegDiffusion, NoiseSchedule, SegCondUNet, hash_prompt,
    make_ddim_sampler, make_diffusion_train_step,
)
from multishiftseg_tpu.cgaug.segmenter import (
    JaxPromptableSegmenter, PromptUNet, make_segmenter_train_step,
)

TINY = dict(base=16, mults=(1, 2))


def test_prompt_hash_deterministic():
    a = hash_prompt("a photo taken from a dash cam, rainy day")
    b = hash_prompt("a photo taken from a dash cam, rainy day")
    c = hash_prompt("a photo taken from a dash cam, snowy night")
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    assert (hash_prompt("") == 0).all()  # null prompt = unconditional ids
    assert a.min() >= 0 and a.max() < 1024


@pytest.mark.slow
def test_diffusion_training_reduces_loss():
    model = SegCondUNet(**TINY)
    rng = np.random.RandomState(0)
    seg = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    img = -seg  # learnable deterministic mapping
    ids = jnp.asarray(np.stack([hash_prompt("city street"), hash_prompt("")]))
    params = model.init({"params": jax.random.PRNGKey(0)}, img, seg,
                        jnp.zeros((2,), jnp.int32), ids)["params"]
    tx = optax.adam(2e-3)
    step = make_diffusion_train_step(model, tx)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        params, opt_state, key, loss = step(params, opt_state, key, img, seg, ids)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert np.isfinite(losses).all()


def test_ddim_sampler_deterministic_and_bounded():
    model = SegCondUNet(**TINY)
    z = jnp.zeros((1, 32, 32, 3))
    ids = jnp.asarray(hash_prompt("foggy street"))[None]
    params = model.init({"params": jax.random.PRNGKey(0)}, z, z,
                        jnp.zeros((1,), jnp.int32), ids)["params"]
    sample = make_ddim_sampler(model, (32, 32), steps=4, cfg_scale=9.0)
    a = sample(params, z, ids, jax.random.PRNGKey(7))
    b = sample(params, z, ids, jax.random.PRNGKey(7))
    c = sample(params, z, ids, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    assert a.shape == (1, 32, 32, 3)
    # x0-clipping keeps the final step's prediction in the image range
    assert float(jnp.abs(a).max()) <= 1.0 + 1e-5


def _train_box_segmenter(steps=80, size=48, seed=0):
    """Teach the tiny segmenter to reproduce its box-prompt channel."""
    from multishiftseg_tpu.cgaug.segmenter import _box_channel

    model = PromptUNet(base=16, mults=(1, 2))
    params = model.init({"params": jax.random.PRNGKey(seed)},
                        jnp.zeros((1, size, size, 4)))["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_segmenter_train_step(model, tx)
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        xs, ts = [], []
        for _ in range(4):
            # full size range (tiny to near-full-frame): at inference the pasted
            # anomaly's box can cover most of the image
            x0, y0 = rng.randint(0, size - 8, 2)
            x1 = x0 + rng.randint(4, size - x0 + 1)
            y1 = y0 + rng.randint(4, size - y0 + 1)
            box = _box_channel(size, size, np.asarray([x0, y0, x1, y1]))
            img = rng.rand(size, size, 3).astype(np.float32) * 2 - 1
            xs.append(np.concatenate([img, box[..., None]], -1))
            ts.append(box)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ts))
        )
    return model, params, float(loss)


def test_segmenter_learns_box_prompting():
    model, params, loss = _train_box_segmenter()
    assert loss < 0.1
    seg = JaxPromptableSegmenter(params=params, base=16)
    seg.model = model
    seg._fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    img = (np.random.RandomState(3).rand(48, 48, 3) * 255).astype(np.uint8)
    box = np.asarray([10, 8, 30, 26])
    pred = seg.segment_box(img, box)
    want = np.zeros((48, 48), np.uint8)
    want[8:27, 10:31] = 1
    iou = np.logical_and(pred, want).sum() / max(np.logical_or(pred, want).sum(), 1)
    assert iou > 0.8


@pytest.mark.slow
def test_generation_e2e_with_real_backends(tmp_path):
    """The full MultiShiftGenerator.run() path through REAL models: JAX diffusion
    backend (DDIM, classifier-free guidance) + trained promptable segmenter; output
    is a generated image + a trainId label with pasted pixels = 254."""
    from multishiftseg_tpu.cgaug.generate import GenerationConfig, MultiShiftGenerator

    h, w = 128, 160

    class RectSource:  # solid rectangle -> bbox-filling mask, so a correct
        def sample(self, rng):  # box-prompt segmenter legitimately passes IoU>0.7
            m = np.zeros((100, 100), np.uint8)
            m[10:90, 20:80] = 1
            return m, "sofa"

    model, params, _ = _train_box_segmenter()
    segmenter = JaxPromptableSegmenter(params=params, base=16)
    segmenter.model = model
    segmenter._fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

    gen = MultiShiftGenerator(
        diffusion=JaxSegDiffusion((h, w), base=16, mults=(1, 2), steps=6, seed=0),
        anomaly_source=RectSource(),
        segmenter=segmenter,
        cfg=GenerationConfig(iou_threshold=0.7, max_retries=3, seed=0),
    )

    color = np.zeros((h, w, 3), np.uint8)
    color[:] = (70, 130, 180)  # sky
    color[h // 3 :] = (128, 64, 128)  # road
    color_p = tmp_path / "aachen_000000_000019_gtFine_color.png"
    Image.fromarray(color).save(color_p)
    tid_p = tmp_path / "aachen_000000_000019_gtFine_labelTrainIds.png"
    Image.fromarray(np.zeros((h, w), np.uint8)).save(tid_p)

    out_img = tmp_path / "img"
    out_lbl = tmp_path / "lbl"
    gen.run([str(color_p)], [str(tid_p)], str(out_img), str(out_lbl))

    imgs = list(out_img.glob("*.png"))
    lbls = list(out_lbl.glob("*.png"))
    assert len(imgs) == 1 and len(lbls) == 1
    image = np.asarray(Image.open(imgs[0]))
    label = np.asarray(Image.open(lbls[0]))
    assert image.shape == (h, w, 3) and image.dtype == np.uint8
    assert (label == 254).sum() > 100  # pasted anomaly pixels marked OOD
    assert (label == 0).sum() > 0  # rest untouched


@pytest.mark.slow
def test_train_backends_drivers(tmp_path):
    """The CLI training drivers run end-to-end on synthetic data: walk the
    Cityscapes color-pair layout, take real optimizer steps, save checkpoints."""
    from multishiftseg_tpu.cgaug import train_backends as TB

    city = tmp_path / "cs"
    for i in range(2):
        stem = f"aachen_{i:06d}_000019"
        p = city / "leftImg8bit" / "train" / "aachen" / f"{stem}_leftImg8bit.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((64, 128, 3), np.uint8)).save(p)
        q = city / "gtFine" / "train" / "aachen" / f"{stem}_gtFine_color.png"
        q.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.full((64, 128, 3), 128, np.uint8)).save(q)
    pairs = TB.walk_color_pairs(str(city))
    assert len(pairs) == 2

    params, loss = TB.train_diffusion(
        str(city), str(tmp_path / "out"), steps=3, batch=2,
        image_hw=(32, 64), base=16, save_every=0, log_every=10,
    )
    assert np.isfinite(loss)
    from multishiftseg_tpu.train.checkpoint import CheckpointManager
    assert CheckpointManager(str(tmp_path / "out")).exists("diffusion_last")

    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    m = np.zeros((40, 40), np.uint8)
    m[5:30, 10:35] = 255
    Image.fromarray(m).save(mask_dir / "obj0.png")
    params, loss = TB.train_segmenter(
        str(tmp_path / "out2"), mask_dir=str(mask_dir), steps=3, batch=2,
        size=32, base=16, log_every=10,
    )
    assert np.isfinite(loss)
    assert CheckpointManager(str(tmp_path / "out2")).exists("segmenter_last")


@pytest.mark.slow
def test_diffusion_training_palette_and_paste(tmp_path):
    """Round-4 diffusion-training fixes: (a) training conditions on the
    ADE20K-remapped palette — the palette ``MultiShiftGenerator.generate``
    actually feeds at generation time — not raw Cityscapes colors; (b) the
    anomaly paste augmentation composites an object cut-out into BOTH the
    image (RGB pixels) and the label (its ADE class color), road-constrained,
    so the diffusion learns to render the label colors the generation-time
    ``paste_anomaly`` writes."""
    from multishiftseg_tpu.cgaug import train_backends as TB
    from multishiftseg_tpu.cgaug.label_ops import cityscapes_to_ade20k
    from multishiftseg_tpu.cgaug.palettes import ade20k_color

    city = tmp_path / "cs"
    color = np.zeros((64, 128, 3), np.uint8)
    color[:24] = (70, 130, 180)   # Cityscapes sky
    color[24:] = (128, 64, 128)   # Cityscapes road
    for i in range(2):
        stem = f"aachen_{i:06d}_000019"
        p = city / "leftImg8bit" / "train" / "aachen" / f"{stem}_leftImg8bit.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((64, 128, 3), np.uint8)).save(p)
        q = city / "gtFine" / "train" / "aachen" / f"{stem}_gtFine_color.png"
        q.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(color).save(q)

    # (a) the loader's label palette matches the generation-time remap
    img_u8, lbl_u8 = TB._load_pair_u8(*TB.walk_color_pairs(str(city))[0], (64, 128))
    expect, _ = cityscapes_to_ade20k(color)
    assert (lbl_u8 == expect).all()
    assert not (lbl_u8 == color).all()  # the remap actually changed colors

    # (b) in-place paste: ADE class color into the label, RGB into the image,
    # placed on (ADE-remapped) road pixels
    rng = np.random.RandomState(3)
    cut_mask = np.zeros((40, 40), np.uint8)
    cut_mask[8:32, 8:32] = 1
    cut_img = np.full((40, 40, 3), 200, np.uint8)
    rgb = ade20k_color("sofa")
    img2, lbl2 = img_u8.copy(), lbl_u8.copy()
    TB._paste_training_anomaly(img2, lbl2, cut_img, cut_mask, rgb, rng)
    pasted = np.all(lbl2 == rgb, axis=-1)
    assert pasted.sum() > 20
    assert (img2[pasted] == 200).all()
    road_rgb = ade20k_color("road")
    ys, _ = np.where(pasted)
    assert np.all(expect[ys.max(), 0] == road_rgb)  # paste landed in the road band

    # (c) the train step runs with the in-memory paste bank at paste_prob=1
    _, loss = TB.train_diffusion(
        str(city), str(tmp_path / "out"), steps=2, batch=2, image_hw=(32, 64),
        base=16, save_every=0, log_every=10,
        paste_bank=[(cut_img, cut_mask, rgb)], paste_prob=1.0,
    )
    assert np.isfinite(loss)


@pytest.mark.slow
def test_generation_e2e_with_pretrained_weight_stack(tmp_path):
    """MultiShiftGenerator.run() through the PRETRAINED-WEIGHT backend family at
    tiny configs (random init): SDControlNetGenerator (SD UNet + ControlNet
    branch + CLIP BPE tokenizer + VAE, the `control_sd15_seg.pth` consumers)
    filling the diffusion slot and SAMSegmenter (ViT-det + two-way decoder, the
    `sam_vit_h_4b8939.pth` consumer) filling the segmenter slot — the exact
    pair ``cgaug.weights.build_real_backends`` assembles, so the full-scale
    wiring is exercised end-to-end without the checkpoints. iou_threshold=-1:
    random weights produce arbitrary masks; the plumbing, shapes, and driver
    protocol are under test, not generation quality."""
    import dataclasses

    from test_sd_controlnet import _write_tiny_vocab

    from multishiftseg_tpu.cgaug.clip_text import (CLIPTextEncoder,
                                                   CLIPTokenizer,
                                                   tiny_clip_config)
    from multishiftseg_tpu.cgaug.generate import (GenerationConfig,
                                                  MultiShiftGenerator)
    from multishiftseg_tpu.cgaug.sam import (SAM, SAMSegmenter,
                                             tiny_sam_config)
    from multishiftseg_tpu.cgaug.sd_pipeline import (ControlNetPipeline,
                                                     SamplerConfig,
                                                     SDControlNetGenerator)
    from multishiftseg_tpu.cgaug.sd_unet import (ControlNetBranch, SDUNet,
                                                 tiny_sd_config)
    from multishiftseg_tpu.cgaug.sd_vae import AutoencoderKL, tiny_vae_config

    h = w = 64  # label/image size; latent = /8, tiny VAE upsamples x8 back
    k = jax.random.PRNGKey(0)
    vp, mp = _write_tiny_vocab(tmp_path)
    tok = CLIPTokenizer(vp, mp, max_len=16)
    ucfg = tiny_sd_config()
    vcfg = tiny_vae_config(ch_mult=(1, 1, 2, 2))  # 4 levels -> x8 decode
    ccfg = dataclasses.replace(tiny_clip_config(), vocab_size=len(tok.encoder),
                               max_len=16, width=ucfg.context_dim)

    lat = jnp.zeros((1, h // 8, w // 8, 4))
    hint = jnp.zeros((1, h, w, 3))
    ctx = jnp.zeros((1, 16, ccfg.width))
    ts = jnp.zeros((1,), jnp.int32)
    params = {
        "unet": SDUNet(ucfg).init(k, lat, ts, ctx)["params"],
        "control": ControlNetBranch(ucfg).init(k, lat, hint, ts, ctx)["params"],
        "vae": AutoencoderKL(vcfg).init(k, jnp.zeros((1, h, w, 3)))["params"],
        "clip": CLIPTextEncoder(ccfg).init(k, jnp.zeros((1, 16), jnp.int32))["params"],
    }
    pipe = ControlNetPipeline(params, unet_cfg=ucfg, vae_cfg=vcfg, clip_cfg=ccfg,
                              sampler=SamplerConfig(steps=2, num_train_timesteps=20))
    diffusion = SDControlNetGenerator(params, tok, pipeline=pipe)

    scfg = tiny_sam_config()
    sam_params = SAM(scfg).init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, scfg.img_size, scfg.img_size, 3)),
        jnp.asarray([[4.0, 4.0, 40.0, 40.0]]),
    )["params"]
    segmenter = SAMSegmenter(sam_params, scfg)

    class RectSource:
        def sample(self, rng):
            m = np.zeros((100, 100), np.uint8)
            m[10:90, 20:80] = 1
            return m, "sofa"

    gen = MultiShiftGenerator(
        diffusion=diffusion, anomaly_source=RectSource(), segmenter=segmenter,
        cfg=GenerationConfig(iou_threshold=-1.0, max_retries=2, seed=0),
    )

    color = np.zeros((h, w, 3), np.uint8)
    color[:] = (70, 130, 180)  # sky
    color[h // 3:] = (128, 64, 128)  # road
    color_p = tmp_path / "bochum_000000_000019_gtFine_color.png"
    Image.fromarray(color).save(color_p)
    tid_p = tmp_path / "bochum_000000_000019_gtFine_labelTrainIds.png"
    Image.fromarray(np.zeros((h, w), np.uint8)).save(tid_p)

    out_img, out_lbl = tmp_path / "img", tmp_path / "lbl"
    gen.run([str(color_p)], [str(tid_p)], str(out_img), str(out_lbl))

    imgs = list(out_img.glob("*.png"))
    lbls = list(out_lbl.glob("*.png"))
    assert len(imgs) == 1 and len(lbls) == 1
    image = np.asarray(Image.open(imgs[0]))
    label = np.asarray(Image.open(lbls[0]))
    assert image.shape == (h, w, 3) and image.dtype == np.uint8
    assert (label == 254).sum() > 50  # pasted anomaly pixels marked OOD
    assert gen.stats["accepted"] == 1 and gen.stats["attempts"] == 1
