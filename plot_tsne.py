"""t-SNE of superpixel features before vs after training.

The reference plot_tsne.py is dead code (imports a nonexistent ``Wessup``
class and calls ``model.preprocess`` which lives on the trainer,
plot_tsne.py:6,21); per the rebuild policy (SURVEY.md §7 quirk 7) outright
crashes are fixed: this version works against our checkpoints.

Usage:
    python plot_tsne.py <data_dir> checkpoint=<ckpt> [rescale_factor=0.4]
                        [output=tsne.png]
"""

from pathlib import Path

import numpy as np

from wesup_tpu import cli


def main(data_dir, checkpoint=None, rescale_factor=0.4, index=0,
         output="tsne.png", **kwargs):
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    from wesup_tpu.data.datasets import SegmentationDataset
    from wesup_tpu.data.loader import CanvasSpec, place_on_canvas
    from wesup_tpu.models import initialize_trainer, wesup
    from wesup_tpu.models.steps import n_clusters, slic
    from wesup_tpu.ops.segments import superpixel_stats

    dataset = SegmentationDataset(data_dir, rescale_factor=rescale_factor,
                                  train=False)
    sample = dataset[index]
    img = sample["image"]
    h, w = img.shape[:2]
    H, W = ((h + 31) // 32) * 32, ((w + 31) // 32) * 32
    spec = CanvasSpec(H, W)
    item = place_on_canvas(sample, spec)

    trainer = initialize_trainer("wesup", **kwargs)
    config = trainer.config
    K = n_clusters(H, W, config.sp_area)

    imgf = jnp.asarray(item["image"][None].astype(np.float32) / 255.0)
    valid = jnp.asarray(item["valid"][None])
    seg = jax.vmap(lambda im, v: slic(im, v, sp_area=config.sp_area,
                                      compactness=config.sp_compactness))(
        imgf, valid)
    mask = item["pixel_mask"]
    onehot = ((mask[..., None] == np.arange(config.n_classes)) &
              (mask[..., None] >= 0)).astype(np.float32)
    stats = superpixel_stats(seg[0], K, jnp.asarray(onehot), valid[0])
    real = np.asarray(stats.real)
    sp_labels = np.asarray(stats.labels).argmax(axis=1)[real]

    def features(params):
        out = wesup.forward_superpixel(params, imgf, seg, K, valid)
        return np.asarray(out.sp_features[0])[real]

    print("preparing before training ...")
    before = features(trainer.params)

    print("preparing after training ...")
    trainer.load_checkpoint(checkpoint)
    after = features(trainer.params)

    tsne = TSNE()
    before_2d = tsne.fit_transform(before)
    after_2d = TSNE().fit_transform(after)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 5))
    ax1.scatter(before_2d[:, 0], before_2d[:, 1], c=sp_labels, alpha=0.3)
    ax1.set_title("before training")
    ax2.scatter(after_2d[:, 0], after_2d[:, 1], c=sp_labels, alpha=0.3)
    ax2.set_title("after training")
    plt.savefig(output, dpi=200)
    print(f"saved to {output}")

    np.savez(Path(output).with_suffix(".npz"), before_x2d=before_2d,
             after_x2d=after_2d, sp_labels=sp_labels)


if __name__ == "__main__":
    cli.run(main)
