"""Mock-weights test of the sampling-qualification refusal path (release gate).

``tools/validate_release.py`` re-qualifies the approximate deformable-sampling
fast paths on real weights the moment they are obtainable: each mode's
AUROC/AUPRC/FPR95 deltas vs the measured exact-bilinear result are gated at
the ±0.5-pt BASELINE.md budget, the verdict is recorded next to the checkpoint
and ``test_runner.build_m2f_forward`` refuses a mode recorded REFUSED. This
test drives that whole chain with mock forwards (one exact, one within-budget
approximation, one broken approximation) on the synthetic track dataset —
no real weights needed to prove the refusal sticks.
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "validate_release", REPO / "tools" / "validate_release.py")
validate_release = importlib.util.module_from_spec(spec)
spec.loader.exec_module(validate_release)


@pytest.fixture
def track_data(tmp_path):
    """Two 96x96 track-layout images with a known 30:60 square anomaly."""
    rng = np.random.RandomState(0)
    track = tmp_path / "anomaly_track"
    for i in range(2):
        p = track / "images" / f"val{i}.jpg"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(p)
        q = track / "labels_masks" / f"val{i}_labels_semantic.png"
        q.parent.mkdir(parents=True, exist_ok=True)
        lab = np.zeros((96, 96), np.uint8)
        lab[30:60, 30:60] = 1
        lab[:8] = 255
        Image.fromarray(lab).save(q)
    return str(track)


def _mock_forward(invert: bool):
    """anomaly = indicator of the known square (perfect detector), or its
    inversion (a catastrophically broken approximation)."""

    def fwd(imgs):
        imgs = np.asarray(imgs)
        a = np.zeros(imgs.shape[:3], np.float32)
        a[:, 30:60, 30:60] = 1.0
        return (1.0 - a) if invert else a, None

    return fwd


def test_refused_fast_path_is_recorded_and_enforced(track_data, tmp_path,
                                                    monkeypatch):
    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.train import test_runner

    cfg = load_config(None)
    weight_path = tmp_path / "m2f_best.pth"
    weight_path.write_bytes(b"mock")

    # mock builder: bilinear + nearest exact; 'shared' broken beyond budget
    def fake_build(cfg, wp, spatial_devices=0, sample_mode="bilinear",
                   enforce_qualification=True, score_lowres=False,
                   score_topq=0):
        if enforce_qualification:
            test_runner.check_sampling_qualification(
                wp, sample_mode + ("+lowres" if score_lowres else "")
                + (f"+topq{score_topq}" if score_topq else ""))
        return _mock_forward(invert=(sample_mode == "shared"))

    monkeypatch.setattr(test_runner, "build_m2f_forward", fake_build)

    # exact-path metrics on the same dataset (the qualification reference)
    ev = test_runner.OODEvaluator(
        cfg, _mock_forward(invert=False), {"RoadAnomaly21": track_data})
    bilinear = ev.test_all(("RoadAnomaly21",))["RoadAnomaly21"]
    bilinear_pts = {k: 100.0 * float(bilinear[k])
                    for k in ("AUROC", "AUPRC", "FPR_TPR95")}
    assert bilinear_pts["AUROC"] > 99.0  # the mock detector is perfect

    qual = validate_release.qualify_sampling_modes(
        cfg, str(weight_path), "RoadAnomaly21", track_data,
        bilinear_pts, tolerance=0.5)
    assert qual["modes"]["nearest"]["qualified"] is True
    assert qual["modes"]["int8"]["qualified"] is True
    assert qual["modes"]["shared"]["qualified"] is False
    assert abs(qual["modes"]["shared"]["delta_pts"]["AUROC"]) > 0.5

    # record the verdict next to the weights (what validate_release main does)
    qp = test_runner.sampling_qualification_path(str(weight_path))
    qp.write_text(json.dumps(qual))

    # the refusal is enforced at forward construction for THESE weights...
    with pytest.raises(RuntimeError, match="REFUSED"):
        test_runner.check_sampling_qualification(str(weight_path), "shared")
    with pytest.raises(RuntimeError, match="REFUSED"):
        fake_build(cfg, str(weight_path), sample_mode="shared")
    # ...while qualified modes, the exact path, and the re-qualification
    # bypass all stay constructible
    test_runner.check_sampling_qualification(str(weight_path), "nearest")
    test_runner.check_sampling_qualification(str(weight_path), "bilinear")
    fake_build(cfg, str(weight_path), sample_mode="shared",
               enforce_qualification=False)
    # other weights are unaffected (artifact is per-checkpoint)
    test_runner.check_sampling_qualification(
        str(tmp_path / "other.pth"), "shared")


def test_real_builder_checks_gate_before_model_construction(tmp_path,
                                                            monkeypatch):
    """build_m2f_forward must refuse BEFORE loading weights / building the
    model — the gate is cheap, the trainer construction is not."""
    from multishiftseg_tpu.core.config import load_config
    from multishiftseg_tpu.train import test_runner
    from multishiftseg_tpu.train import m2f_trainer

    weight_path = tmp_path / "w.pth"
    weight_path.write_bytes(b"mock")
    qp = test_runner.sampling_qualification_path(str(weight_path))
    qp.write_text(json.dumps(
        {"modes": {"nearest": {"qualified": False,
                               "delta_pts": {"AUPRC": -3.2}}}}))

    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError("trainer constructed despite refusal")

    monkeypatch.setattr(m2f_trainer, "TrainM2FOOD", Boom)
    with pytest.raises(RuntimeError, match="REFUSED"):
        test_runner.build_m2f_forward(load_config(None), str(weight_path),
                                      sample_mode="nearest")
