"""Offline tool scripts: behavior smoke tests on a synthetic dataset."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from make_dataset import make_dataset  # noqa: E402


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_scripts")
    return make_dataset(root, n_train=2, n_val=1, hw=(64, 80),
                        with_points=False)


def test_generate_points(dataset):
    import generate_points as gp
    from _common import imread_gray

    mask_dir = dataset / "train" / "masks"
    for mask_path in mask_dir.iterdir():
        mask = np.asarray(imread_gray(mask_path))
        pts = gp.generate_points(mask, point_ratio=1e-3,
                                 rng=np.random.default_rng(0))
        assert len(pts) >= 1
        # every point's class matches the mask at its (row, col) position
        for r, c, cls in pts:
            assert mask[r, c] == cls


def test_generate_points_cli_writes_xy_csv(dataset):
    out = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "scripts" /
                             "generate_points.py"),
         str(dataset / "train"), "-p", "0.001", "--seed", "0"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    csvs = sorted((dataset / "train" / "points-0.001").glob("*.csv"))
    assert len(csvs) == 2
    from _common import imread_gray

    mask = np.asarray(imread_gray(dataset / "train" / "masks" /
                                  (csvs[0].stem + ".png")))
    rows = [line.split(",") for line in csvs[0].read_text().splitlines()]
    for x, y, cls in rows:
        # CSV is (x, y, class): x is the column
        assert mask[int(y), int(x)] == int(cls)


def test_count_points_matches_pandas_semantics(dataset, tmp_path):
    """count_points prints the mean row count per CSV with the reference's
    pd.read_csv semantics (first line consumed as header)."""
    pdir = tmp_path / "points"
    pdir.mkdir()
    (pdir / "a.csv").write_text("1,2,0\n3,4,1\n")      # pandas: len 1
    (pdir / "b.csv").write_text("5,6,0\n7,8,1\n9,9,0\n")  # pandas: len 2
    out = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "scripts" /
                             "count_points.py"), str(pdir)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert float(out.stdout.strip()) == 1.5


def test_generate_area(dataset):
    out = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "scripts" /
                             "generate_area.py"), str(dataset / "train")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    import pandas as pd

    df = pd.read_csv(dataset / "train" / "area.csv")
    assert len(df) == 2
    assert (df["area"] <= 1.0).all()


def test_visualize_masks(dataset, tmp_path):
    out_dir = tmp_path / "viz"
    out = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent / "scripts" /
                             "visualize_masks.py"),
         str(dataset / "train" / "masks"), "-o", str(out_dir)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert len(list(out_dir.iterdir())) == 2


def test_paint_masks_roundtrip(dataset, tmp_path):
    import paint_masks

    from _common import imread_gray

    mask = np.asarray(imread_gray(
        next((dataset / "train" / "masks").iterdir())))
    pred_img, gt_img = paint_masks.paint_pred_and_gt(mask, mask)
    # perfect prediction inherits GT colors exactly
    np.testing.assert_array_equal(pred_img, gt_img)


def test_paint_match_rule_vs_naive():
    """Vectorized overlap matching == the reference's per-pair loop rule:
    inherit the largest GT id whose area is covered > 0.5, else max_id+own."""
    import paint_masks

    rng = np.random.default_rng(5)
    gt = np.zeros((48, 48), np.uint8)
    gt[2:14, 2:20] = 255    # large object
    gt[20:30, 5:12] = 255   # small object
    gt[34:46, 20:44] = 255  # wide object
    pred = np.zeros_like(gt)
    pred[2:14, 2:16] = 255    # covers most of object 1
    pred[22:28, 6:10] = 255   # covers <0.5 of object 2? (36/70 px ~ 0.51)
    pred[40:46, 38:47] = 255  # covers <0.5 of object 3 -> unmatched
    noise = rng.random(gt.shape) < 0.01
    pred[noise] = 255

    from _common import label8
    pl, gl = label8(pred), label8(gt)
    got = paint_masks.match_pred_to_gt(pl, gl)

    # naive spec
    want = np.zeros_like(pl)
    max_id = max(pl.max(), gl.max())
    for pid in range(1, pl.max() + 1):
        pr = pl == pid
        matched = []
        for gid in range(1, gl.max() + 1):
            gr = gl == gid
            if (pr & gr).sum() / gr.sum() > 0.5:
                matched.append((gr.sum(), gid))
        # first-max tie-break, as in the reference's max(key=area)
        want[pr] = (max(matched, key=lambda t: t[0])[1] if matched
                    else max_id + pid)
    np.testing.assert_array_equal(got, want)


def test_make_dataset_hard_mode(tmp_path):
    """hard=True builds the non-color-separable generator's layout incl.
    held-out test splits; masks stay binary and points stay in-bounds."""
    import cv2

    from make_dataset import make_dataset, make_image, make_image_hard

    root = make_dataset(tmp_path / "h", n_train=2, n_val=1, hw=(64, 80),
                        seed=3, hard=True, n_testA=1, n_testB=1)
    for split in ("train", "val", "testA", "testB"):
        assert (root / split / "images").exists(), split
        assert (root / split / "masks").exists(), split
    mask = cv2.imread(str(next((root / "testA" / "masks").iterdir())),
                      cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(mask)) <= {0, 1}
    for csv in (root / "train" / "points").iterdir():
        for line in csv.read_text().splitlines():
            x, y, c = (int(v) for v in line.split(","))
            assert 0 <= x < 80 and 0 <= y < 64 and c in (0, 1)

    # the hard generator defeats pure color rules: the best single-channel
    # threshold Dice sits well below the easy generator's (which is ~1.0)
    rng = np.random.default_rng(0)
    def best_thresh_dice(img, m):
        gt, best = m > 0, 0.0
        for ch in range(3):
            for t in range(40, 240, 10):
                for pred in (img[..., ch] < t, img[..., ch] > t):
                    tot = pred.sum() + gt.sum()
                    if tot:
                        best = max(best, 2 * (pred & gt).sum() / tot)
        return best
    hard = best_thresh_dice(*make_image_hard(rng, 128, 160))
    easy = best_thresh_dice(*make_image(np.random.default_rng(0), 128, 160))
    assert easy > 0.99, easy
    assert hard < 0.92, hard
