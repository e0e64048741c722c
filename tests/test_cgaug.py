"""CG-Aug label ops, prompting, and the generation driver with stub backends."""

import numpy as np
import pytest

from multishiftseg_tpu.cgaug.generate import GenerationConfig, MultiShiftGenerator
from multishiftseg_tpu.cgaug.label_ops import cityscapes_to_ade20k, paste_on_road
from multishiftseg_tpu.cgaug.palettes import ade20k_color
from multishiftseg_tpu.cgaug.prompts import get_prompt


def _city_label(h=600, w=800):
    lbl = np.zeros((h, w, 3), np.uint8)
    lbl[:] = (70, 130, 180)  # sky
    lbl[h // 2 :] = (128, 64, 128)  # road
    lbl[h // 2 : h // 2 + 40, :100] = (220, 20, 60)  # person
    return lbl


def test_cityscapes_to_ade20k_remap():
    ade, present = cityscapes_to_ade20k(_city_label())
    assert "road" in present and "sky" in present and "person" in present
    assert (np.all(ade == ade20k_color("road"), -1)).sum() > 0
    assert (np.all(ade == ade20k_color("sky"), -1)).sum() > 0
    # no cityscapes road color should remain
    assert (np.all(ade == (128, 64, 128), -1)).sum() == 0


def test_paste_on_road_places_object_on_road():
    ade, _ = cityscapes_to_ade20k(_city_label())
    mask = np.zeros((50, 80), np.uint8)
    mask[10:40, 20:60] = 1
    rng = np.random.default_rng(0)
    rgb = ade20k_color("animal")
    out = paste_on_road(ade, mask, rgb, rng)
    pasted = np.all(out == rgb, -1)
    assert pasted.sum() > 0
    # longer side rescaled into [200, 500]
    ys, xs = np.where(pasted)
    assert 150 <= max(ys.max() - ys.min(), xs.max() - xs.min()) <= 500


def test_paste_size_is_configurable():
    """min/max paste sizes thread through paste_anomaly/GenerationConfig —
    the reference's absolute 200-500px defaults assume 1024x2048 labels;
    miniature protocols pass proportional bounds instead."""
    from multishiftseg_tpu.cgaug.label_ops import paste_anomaly

    ade, _ = cityscapes_to_ade20k(_city_label())
    mask = np.zeros((50, 80), np.uint8)
    mask[10:40, 20:60] = 1
    rng = np.random.default_rng(0)
    _, amask = paste_anomaly(ade, mask, "animal", rng, min_size=40, max_size=80)
    ys, xs = np.where(amask)
    assert 30 <= max(ys.max() - ys.min(), xs.max() - xs.min()) <= 80


def test_get_prompt_composition():
    rng = np.random.default_rng(0)
    seen_plain = seen_domain = False
    for _ in range(50):
        prompt, domain = get_prompt(("rainy",), ("Zurich",), rng, ood_name="sofa")
        assert "dash cam" in prompt
        assert "There is a sofa accidentally staying on the road." in prompt
        if domain == "":
            seen_plain = True
        else:
            assert domain == "_rainy_day_Zurich" or domain == "_rainy_night_Zurich"
            seen_domain = True
    assert seen_plain and seen_domain


class StubDiffusion:
    def generate(self, seg_label_rgb, prompt):
        return (seg_label_rgb // 2 + 64).astype(np.uint8)


class StubSource:
    def sample(self, rng):
        m = np.zeros((100, 100), np.uint8)
        m[20:80, 30:70] = 1
        return m, "animal"


class AcceptAllSAM:
    def segment_box(self, image, box):
        m = np.zeros(image.shape[:2], np.uint8)
        m[box[1] : box[3] + 1, box[0] : box[2] + 1] = 1
        return m


class RejectingDetector:
    def __init__(self, score):
        self.score = score

    def anomaly_score(self, image):
        return np.full(image.shape[:2], self.score, np.float32)


def test_generator_accepts_and_rejects():
    gen = MultiShiftGenerator(
        StubDiffusion(), StubSource(),
        GenerationConfig(max_retries=2, iou_threshold=0.3),
        segmenter=AcceptAllSAM(), detector=RejectingDetector(0.0),
    )
    out = gen.generate(_city_label())
    assert out is not None
    image, mask, name, domain = out
    assert image.dtype == np.uint8 and mask.sum() > 0 and name == "animal"

    gen_bad = MultiShiftGenerator(
        StubDiffusion(), StubSource(),
        GenerationConfig(max_retries=2, score_threshold=100.0),
        detector=RejectingDetector(0.0),
    )
    assert gen_bad.generate(_city_label()) is None


def test_weight_registry(tmp_path, monkeypatch):
    """fetch_weight resolves registered names; gdrive entries raise with the
    manual URL; existing files short-circuit without network."""
    from multishiftseg_tpu.cgaug import weights as W

    dest = tmp_path / "sam_vit_h_4b8939.pth"
    dest.write_bytes(b"x")
    assert W.fetch_weight("sam_vit_h", str(tmp_path)) == str(dest)
    with pytest.raises(RuntimeError, match="Google Drive"):
        W.fetch_weight("bt-f-xl", str(tmp_path))
    with pytest.raises(KeyError):
        W.fetch_weight("nope", str(tmp_path))


def test_get_cities_job_sharding():
    """generation-job sharding parity (reference get_cities,
    generation_utils.py:14-30): 4 train batches cover all 18 train cities;
    val = frankfurt/lindau/munster."""
    from multishiftseg_tpu.cgaug.generate import CITY_BATCHES, get_cities

    all_cities = [c for b in CITY_BATCHES for c in b]
    assert len(all_cities) == len(set(all_cities)) == 18
    assert get_cities("train", 2) == CITY_BATCHES[2]
    assert get_cities("val") == ["frankfurt", "lindau", "munster"]


def test_generate_cli_main(tmp_path, monkeypatch):
    """The CLI driver (`python -m multishiftseg_tpu.cgaug.generate`): city-batch
    walking, backend wiring, and the DiverseCityscapes output layout
    (<out>/{leftImg8bit,gtFine}/<split>/<city>/)."""
    import numpy as np
    from PIL import Image

    from multishiftseg_tpu.cgaug import generate as G

    cs = tmp_path / "cityscapes"
    city = "aachen"  # city batch 0
    gt = cs / "gtFine" / "train" / city
    gt.mkdir(parents=True)
    rng = np.random.default_rng(0)
    color = np.zeros((64, 128, 3), np.uint8)
    color[:32] = (70, 130, 180)  # sky
    color[32:] = (128, 64, 128)  # road
    tid = np.full((64, 128), 255, np.uint8)
    tid[32:] = 0
    for frame in ("000000_000019", "000001_000019"):
        Image.fromarray(color).save(gt / f"{city}_{frame}_gtFine_color.png")
        Image.fromarray(tid).save(gt / f"{city}_{frame}_gtFine_labelTrainIds.png")

    class StubDiffusion:
        def generate(self, seg, prompt):
            return rng.integers(0, 255, seg.shape, np.uint8)

    class StubSource:
        def sample(self, rng):
            return np.ones((8, 8), np.uint8), "boat"  # a real ADE20K class

    monkeypatch.setattr(G, "ADE20KAnomalySource", None, raising=False)
    monkeypatch.setattr(
        "multishiftseg_tpu.cgaug.train_backends.load_backends",
        lambda d, s, **kw: (StubDiffusion(), None))
    # route the ade source through the stub (main imports it from the module)
    import multishiftseg_tpu.cgaug.ade20k_source as ade

    monkeypatch.setattr(ade, "ADE20KAnomalySource", lambda root: StubSource())

    out = tmp_path / "gen"
    stats = G.main([
        "--cityscapes_root", str(cs), "--ade_root", "unused",
        "--out_root", str(out), "--split", "train", "--city_batch", "0",
        "--backend", "trainable", "--diffusion_ckpt", "unused",
    ])
    assert stats["accepted"] == 2 and stats["failed_images"] == 0
    for frame in ("000000_000019", "000001_000019"):
        img = out / "leftImg8bit" / "train" / city / f"{city}_{frame}_leftImg8bit.png"
        lbl = (out / "gtFine" / "train" / city /
               f"{city}_{frame}_gtFine_labelTrainIds.png")
        assert img.exists() and lbl.exists()
        l = np.asarray(Image.open(lbl))
        assert (l == 254).any()  # pasted anomaly pixels labelled OOD

    # resume-by-existence: a second run generates nothing new
    before = stats["attempts"]
    stats2 = G.main([
        "--cityscapes_root", str(cs), "--ade_root", "unused",
        "--out_root", str(out), "--split", "train", "--city_batch", "0",
        "--backend", "trainable", "--diffusion_ckpt", "unused",
    ])
    assert stats2["attempts"] == 0
