"""Contest metrics vs hand-computed ground truth."""

import numpy as np

from wesup_tpu.utils.metrics import (accuracy, detection_f1, dice, hausdorff,
                                     object_dice, object_hausdorff)


def _two_objects():
    G = np.zeros((50, 50), np.int32)
    G[5:15, 5:15] = 1    # object A, 100 px
    G[30:45, 30:45] = 1  # object B, 225 px
    return G


def test_accuracy_and_dice():
    G = _two_objects()
    S = G.copy()
    assert accuracy(S, G) == 1.0
    assert abs(dice(S, G) - 1.0) < 1e-5
    S2 = np.zeros_like(G)
    assert dice(S2, G) < 1e-5


def test_detection_f1_perfect_and_partial():
    G = _two_objects()
    assert detection_f1(G, G) > 0.999
    # detect only object B fully: TP=1, FP=0, FN=1 -> P=1, R=.5, F1=2/3
    S = np.zeros_like(G)
    S[30:45, 30:45] = 1
    f1 = detection_f1(S, G)
    assert abs(f1 - 2 / 3) < 1e-3
    # empty vs empty is 1; empty vs nonempty is 0
    assert detection_f1(np.zeros_like(G), np.zeros_like(G)) == 1.0
    assert detection_f1(np.zeros_like(G), G) == 0.0


def test_detection_f1_overlap_threshold():
    G = np.zeros((50, 50), np.int32)
    G[0:10, 0:10] = 1  # 100 px
    S = np.zeros_like(G)
    S[0:10, 0:4] = 1   # 40% overlap of GT -> not a TP
    assert detection_f1(S, G) < 1e-3
    S[0:10, 0:6] = 1   # 60% overlap -> TP
    assert detection_f1(S, G) > 0.99


def test_object_dice_identity_and_halves():
    G = _two_objects()
    assert abs(object_dice(G, G) - 1.0) < 1e-6
    assert object_dice(np.zeros_like(G), G) == 0.0
    assert object_dice(np.zeros_like(G), np.zeros_like(G)) == 1.0


def test_hausdorff_known_distance():
    S = np.zeros((20, 20))
    G = np.zeros((20, 20))
    S[5, 5] = 1
    G[5, 9] = 1
    assert abs(hausdorff(S, G) - 4.0) < 1e-6
    assert hausdorff(np.zeros_like(S), np.zeros_like(G)) == 0.0
    assert np.isinf(hausdorff(S, np.zeros_like(G)))


def test_object_hausdorff_identity():
    G = _two_objects()
    assert object_hausdorff(G, G) == 0.0
