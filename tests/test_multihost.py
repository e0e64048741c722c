"""REAL multi-process multi-host execution (VERDICT r3 #3 / SURVEY §2.9 DCN).

Spawns 2 OS processes that join a ``jax.distributed`` CPU cluster (gloo
collectives, 2 local devices each = 4 global) and drive the actual
``TrainDeepLabOOD`` recipe through ``make_global_mesh`` + the sharded
``Loader`` + ``shard_global_batch`` — the first execution of this path with
``process_count > 1``. Asserts:

  1. per-epoch train loss and validation metrics match a single-process run
     of the SAME global batch (4 devices in one process) — the multi-host
     assembly is numerically the same program;
  2. Orbax save (a collective under multi-host — the round-3 barrier fix) and
     full resume survive 2 processes.

The reference has nothing comparable (``nn.DataParallel`` only,
``train_deeplab.py:90-91``); its vestigial dist hooks never ran either
(SURVEY §2.9).
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

# every test here trains/evaluates real models end-to-end (durations in
# pyproject); the core lane (pytest -m 'not slow') skips the whole module
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("mh_data")
    rng = np.random.RandomState(0)

    def save_img(path, h=128, w=128):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)

    def save_label(path, h=128, w=128, ood=False):
        path.parent.mkdir(parents=True, exist_ok=True)
        lab = rng.randint(0, 19, (h, w)).astype(np.uint8)
        if ood:
            lab[40:70, 40:70] = 254
        Image.fromarray(lab).save(path)

    city = tmp_path / "cityscapes"
    gen = tmp_path / "DTWP"
    for i in range(4):
        stem = f"aachen_{i:06d}_000019"
        save_img(city / "leftImg8bit" / "train" / "aachen" / f"{stem}_leftImg8bit.png")
        save_label(city / "gtFine" / "train" / "aachen"
                   / f"{stem}_gtFine_labelTrainIds.png")
        save_img(gen / "leftImg8bit" / "train" / "aachen" / f"{stem}_x_leftImg8bit.png")
        save_label(gen / "gtFine" / "train" / "aachen"
                   / f"{stem}_x_gtFine_labelTrainIds.png", ood=True)

    track = tmp_path / "anomaly_track"
    for i in range(2):
        save_img(track / "images" / f"val{i}.jpg", 96, 96)
        p = track / "labels_masks" / f"val{i}_labels_semantic.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        lab = np.zeros((96, 96), np.uint8)
        lab[30:60, 30:60] = 1
        lab[:8] = 255
        Image.fromarray(lab).save(p)

    return {"cityscapes": str(city), "generation": str(gen), "track": str(track)}


def _spawn(fake_data, workdir, out, *, process_id=0, num_processes=1, port=0,
           local_devices=2, exp_id="mh", n_epochs=2, resume=None):
    cmd = [
        sys.executable, WORKER,
        "--process_id", str(process_id), "--num_processes", str(num_processes),
        "--port", str(port), "--local_devices", str(local_devices),
        "--cityscapes_root", fake_data["cityscapes"],
        "--generation_root", fake_data["generation"],
        "--track_root", fake_data["track"],
        "--workdir", str(workdir), "--exp_id", exp_id,
        "--n_epochs", str(n_epochs), "--out", str(out),
    ]
    if resume:
        cmd += ["--resume", resume]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets device counts via jax.config
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)


def _wait(procs, timeout=900):
    deadline = time.time() + timeout
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=max(10.0, deadline - time.time()))
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out[-4000:]}"
    return outs


def _read(path):
    with open(path) as f:
        return json.load(f)


def test_two_process_training_matches_single_process(fake_data, tmp_path):
    # --- single-process reference: one process, 4 local devices -------------
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    sp_out = tmp_path / "sp.json"
    _wait([_spawn(fake_data, sp_dir, sp_out, local_devices=4, exp_id="sp")])
    sp = _read(sp_out)
    assert sp["process_count"] == 1 and sp["global_devices"] == 4
    assert "scalars" in sp and "train/loss" in sp["scalars"]

    # --- 2 processes x 2 local devices = the same 4-device data mesh --------
    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    port = _free_port()
    outs = [tmp_path / f"mp{i}.json" for i in range(2)]
    procs = [
        _spawn(fake_data, mp_dir, outs[i], process_id=i, num_processes=2,
               port=port, local_devices=2, exp_id="mp")
        for i in range(2)
    ]
    _wait(procs)
    mp0, mp1 = _read(outs[0]), _read(outs[1])
    assert mp0["process_count"] == 2 and mp0["global_devices"] == 4
    assert mp1["process_count"] == 2

    # every process agrees on the metric-driven decisions
    assert mp0["best"] == pytest.approx(mp1["best"], rel=1e-6)
    assert mp0["best_ckpt_exists"] and mp0["last_ckpt_exists"]

    # --- equality with the single-process run -------------------------------
    # same seeded global shuffle, same global batch rows (each host loads its
    # contiguous slice), same model/update math -> per-epoch losses and val
    # metrics must agree to float tolerance (reduction orders differ: host
    # concat + 8-row shard vs per-half global arrays + in-jit concat)
    sp_loss = dict(sp["scalars"]["train/loss"])
    mp_loss = dict(mp0["scalars"]["train/loss"])
    assert sp_loss.keys() == mp_loss.keys()
    for epoch in sp_loss:
        assert mp_loss[epoch] == pytest.approx(sp_loss[epoch], rel=2e-4), (
            f"epoch {epoch}: multi-process loss {mp_loss[epoch]} != "
            f"single-process {sp_loss[epoch]}")
    assert mp0["best"]["AUPRC"] == pytest.approx(sp["best"]["AUPRC"], rel=2e-4)

    # --- Orbax full resume under 2 processes (the round-3 barrier fix had ---
    # never executed with process_count > 1)
    port = _free_port()
    outs = [tmp_path / f"re{i}.json" for i in range(2)]
    procs = [
        _spawn(fake_data, mp_dir, outs[i], process_id=i, num_processes=2,
               port=port, local_devices=2, exp_id="mp", n_epochs=3,
               resume="last")
        for i in range(2)
    ]
    _wait(procs)
    re0 = _read(outs[0])
    # resumed at epoch 2 (after the 2 completed epochs) and ran exactly one more
    loss_epochs = [e for e, _ in re0["scalars"]["train/loss"]]
    assert loss_epochs == [0, 1, 2]  # appended, not restarted
    assert re0["best"]["AUPRC"] >= mp0["best"]["AUPRC"] - 1e-9
