"""Device-side compute ops: SLIC, segment pooling, resize, color, augment."""
