"""generate_spl_masks -> WESUPV2Dataset roundtrip."""

import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
from make_dataset import make_dataset  # noqa: E402


def test_spl_masks_roundtrip(tmp_path):
    root = make_dataset(tmp_path / "spl", n_train=2, n_val=1, hw=(64, 64))
    train = root / "train"
    (train / "points").rename(train / "points-0.001")

    out = subprocess.run(
        [sys.executable,
         str(Path(__file__).parent.parent / "scripts" / "generate_spl_masks.py"),
         str(train), "--sp-area", "100"],
        capture_output=True, text=True,
        env={"PYTHONPATH": "/root/.axon_site", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-800:]
    spl_dir = train / "spl-masks-0.001"
    spls = sorted(spl_dir.glob("*.npy"))
    assert len(spls) == 2

    spl = np.load(spls[0])
    assert spl.shape == (64, 64, 2)
    assert spl.max() <= 1

    # every annotated point's superpixel is labeled with the point's class
    import csv

    from wesup_tpu.ops.slic import slic
    import jax.numpy as jnp
    from wesup_tpu.data.datasets import imread_rgb

    img = imread_rgb(train / "images" / spls[0].name.replace(".npy", ".png"))
    with open(train / "points-0.001" / spls[0].name.replace(".npy", ".csv")) as fp:
        points = [[int(v) for v in row] for row in csv.reader(fp) if row]
    for y, x, cls in points:  # generate_spl_masks indexes segments[x, y]
        if 0 <= x < 64 and 0 <= y < 64:
            assert spl[x, y, cls] == 1

    # WESUPV2Dataset loads them (rename to the plain spl-masks dir)
    spl_dir.rename(train / "spl-masks")
    from wesup_tpu.data.datasets import WESUPV2Dataset

    ds = WESUPV2Dataset(train, train=False)
    sample = ds[0]
    assert sample["spl_mask"].shape[-1] == 2
    assert sample["coords"].shape == (*sample["image"].shape[:2], 2)
