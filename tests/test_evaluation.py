"""Evaluation-harness tests: inference sweep, metric sweep, persistence,
and the optional refinement passes (reference test.py equivalents)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsir_tpu.config import Config, ModelConfig, replace
from deepsir_tpu.data.base import Loader
from deepsir_tpu.data.synthetic import SyntheticPairs
from deepsir_tpu.evaluation import (evaluate_align, finetune_pose,
                                    inference_align, save_eval_align)
from deepsir_tpu.math import se3_np
from deepsir_tpu.training import create_train_state, make_eval_step


@pytest.fixture(scope="module")
def setup():
    model = ModelConfig(feat_len=3, num_points=256, num_knn=8,
                        sub_sampling_ratio=(4, 4), d_out=(8, 16),
                        out_feat_dim=16, num_classes=5,
                        num_train_reg_iter=1, num_reg_iter=2)
    cfg = Config(pipeline="align", model=model)
    cfg = replace(cfg, data=replace(cfg.data, max_matches=64))
    ds = SyntheticPairs(cfg, split="test", size=3)
    loader = Loader(ds, batch_size=1, shuffle=False, num_workers=1)
    example = {k: v for k, v in next(iter(loader)).items()
               if isinstance(v, np.ndarray)}
    net, state = create_train_state(cfg, example)
    step = make_eval_step(cfg, net)
    return cfg, loader, net, state, step


def test_inference_and_evaluate_and_save(setup, tmp_path):
    cfg, loader, net, state, step = setup
    pred, endpoints = inference_align(
        loader, step, state.params, cfg,
        stats_path=str(tmp_path / "stats.npz"))
    # 2 reg iters + 1 refined-final slot
    assert pred.shape == (3, 3, 3, 4)
    stats = np.load(tmp_path / "stats.npz")["stats"]
    assert stats.shape == (1, 3, 5)

    metrics, summary = evaluate_align(pred, loader, cfg)
    assert len(metrics) == 3 and "succ" in summary

    save_eval_align(pred, endpoints, metrics, summary, str(tmp_path / "out"))
    assert os.path.exists(tmp_path / "out" / "pred_transforms.npy")
    assert os.path.exists(tmp_path / "out" / "metrics_iter_1.csv")
    with open(tmp_path / "out" / "summary_metrics.json") as f:
        assert "succ" in json.load(f)

    # metrics.xlsx round-trip (reference test.py:285-292 writes one
    # worksheet per iteration): parse the zip+XML with the stdlib and check
    # sheet count, headers and a value against the CSV content
    import csv
    import zipfile
    import xml.etree.ElementTree as ET
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(tmp_path / "out" / "metrics.xlsx") as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{ns}sheet")]
        assert names == ["Iter_1", "Iter_2", "Iter_3"]
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = list(sheet.iter(f"{ns}row"))
    with open(tmp_path / "out" / "metrics_iter_1.csv") as f:
        csv_rows = list(csv.reader(f))
    header = [t.text for t in rows[0].iter(f"{ns}t")]
    assert header == csv_rows[0]
    got = [float(v.text) for v in rows[1].iter(f"{ns}v")]
    np.testing.assert_allclose(got, [float(x) for x in csv_rows[1]],
                               rtol=1e-6)
    assert len(rows) == len(csv_rows)


def test_xlsx_nonfinite_cells_written_blank(tmp_path):
    # NaN/inf are not valid OOXML numeric cells; the writer must emit blank
    # cells for them (pandas ExcelWriter parity) so one bad metric doesn't
    # corrupt the whole workbook.
    import zipfile
    import xml.etree.ElementTree as ET
    from deepsir_tpu.utils.xlsx import write_xlsx
    path = str(tmp_path / "nan.xlsx")
    write_xlsx(path, {"Iter_1": (["a", "b", "c"],
                                 [[1.0, float("nan") , float("inf")]])})
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    data_row = list(sheet.iter(f"{ns}row"))[1]
    cells = list(data_row.iter(f"{ns}c"))
    assert len(cells) == 3
    vals = [c.find(f"{ns}v") for c in cells]
    assert vals[0] is not None and float(vals[0].text) == 1.0
    assert vals[1] is None and vals[2] is None
    assert "nan" not in ET.tostring(sheet).decode().lower()


def test_average_poses_shrinks_rotation_jitter(rng):
    """Chordal-mean of jittered SE(3) estimates must land nearer the truth
    than a typical single estimate, and stay a valid rotation."""
    from scipy.spatial.transform import Rotation
    from deepsir_tpu.evaluation import average_poses

    true = Rotation.from_euler("xyz", [20, -10, 35], degrees=True)
    ts = []
    for _ in range(8):
        jit = Rotation.from_rotvec(rng.normal(scale=np.radians(1.5), size=3))
        t = np.eye(3, 4, dtype=np.float32)
        t[:3, :3] = (jit * true).as_matrix()
        t[:3, 3] = [1.0, 2.0, 3.0] + rng.normal(scale=0.05, size=3)
        ts.append(t[None])
    stack = np.stack(ts)                     # (8, 1, 3, 4)
    avg = average_poses(stack)               # (1, 3, 4)
    r = avg[0, :3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) > 0.99
    err_avg = np.degrees(np.arccos(np.clip(
        (np.trace(r.T @ true.as_matrix()) - 1) / 2, -1, 1)))
    errs = [np.degrees(np.arccos(np.clip(
        (np.trace(t[0, :3, :3].T @ true.as_matrix()) - 1) / 2, -1, 1)))
        for t in ts]
    assert err_avg < np.mean(errs), (err_avg, np.mean(errs))


def test_finetune_pose_improves_noisy_init(rng):
    """Adam-on-SE3 should pull a perturbed pose back toward GT when given
    exact correspondences (reference transformation_finetune)."""
    cloud = rng.normal(size=(500, 3)).astype(np.float32)
    ang = 0.4
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = [[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    gt[:3, 3] = [0.3, -0.2, 0.1]
    tgt = se3_np.transform(gt, cloud)

    pang = 0.3
    pert = np.eye(4, dtype=np.float32)
    pert[:3, :3] = [[np.cos(pang), -np.sin(pang), 0],
                    [np.sin(pang), np.cos(pang), 0], [0, 0, 1]]
    noisy = (pert @ gt)[:3].astype(np.float32)

    refined = finetune_pose(jnp.asarray(cloud), jnp.asarray(tgt),
                            jnp.asarray(noisy),
                            jnp.ones((500,), jnp.float32),
                            quantization_size=0.6, max_iter=300)
    err_before = np.abs(noisy - gt[:3]).max()
    err_after = np.abs(np.asarray(refined) - gt[:3]).max()
    assert err_after < err_before * 0.3, (err_before, err_after)
