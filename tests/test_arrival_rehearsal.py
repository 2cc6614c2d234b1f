"""Arrival-day weight/data rehearsal (VERDICT r4 item 8, slow tier).

The north-star accuracy gate — VOC07 mAP within 0.5 pt of 69.9 with the
real ``VGG16_faster_rcnn_final`` weights (SURVEY.md §7) — cannot run in
this zero-egress environment.  This module dress-rehearses the exact
runbook for the day weights/data arrive, so that day is one command, not
a debugging session:

  1. fabricate a chainer-key-schema npz at the FULL production schema
     (13 VGG convs OIHW, fc6 (4096, 25088) in NCHW-flatten order, heads);
  2. fabricate a 2-image VOCdevkit-format directory tree
     (JPEGImages/, Annotations/*.xml, ImageSets/Main/test.txt);
  3. run the LITERAL CLI chain —
     ``scripts/forward.py  --pretrained_model weights.npz`` and
     ``scripts/evaluate.py --dataset voc --pretrained_model weights.npz
     --write_dets`` — as subprocesses;
  4. assert the fc6 flatten permutation was applied (the SURVEY §4.3
     weight-layout trap) and the devkit detection-file format
     (``id score x1 y1 x2 y2``, 1-based inclusive) parses.

mAP here is meaningless (random-ish weights); what is pinned is that the
pipe runs end-to-end at production scale and emits externally re-scorable
artifacts.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_convert import _fake_chainer_tree

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable


def _write_voc_tree(root, rng):
    """Two-image VOCdevkit-format tree with nontrivial annotations."""
    import cv2

    os.makedirs(os.path.join(root, "JPEGImages"))
    os.makedirs(os.path.join(root, "Annotations"))
    os.makedirs(os.path.join(root, "ImageSets", "Main"))
    ids = ["000001", "000002"]
    shapes = [(375, 500), (333, 500)]
    objs = [[("dog", 48, 240, 195, 371, 0), ("person", 8, 12, 352, 498, 0)],
            [("car", 100, 120, 300, 250, 0), ("cat", 30, 40, 200, 200, 1)]]
    for img_id, (h, w), ob in zip(ids, shapes, objs):
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        assert cv2.imwrite(
            os.path.join(root, "JPEGImages", f"{img_id}.jpg"), img)
        parts = [f"<annotation><size><width>{w}</width>"
                 f"<height>{h}</height><depth>3</depth></size>"]
        for name, x1, y1, x2, y2, diff in ob:
            parts.append(
                f"<object><name>{name}</name><difficult>{diff}</difficult>"
                f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
                f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
        parts.append("</annotation>")
        with open(os.path.join(root, "Annotations", f"{img_id}.xml"),
                  "w") as f:
            f.write("".join(parts))
    with open(os.path.join(root, "ImageSets", "Main", "test.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return root, ids


def _run(cmd, timeout=1800):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                       timeout=timeout, env=env)
    assert p.returncode == 0, (
        f"{' '.join(cmd)} failed rc={p.returncode}\n"
        f"--- stdout ---\n{p.stdout[-3000:]}\n"
        f"--- stderr ---\n{p.stderr[-3000:]}")
    return p


def test_weight_arrival_runbook_end_to_end(tmp_path):
    rng = np.random.RandomState(0)
    # 1. chainer-schema npz at the production schema.  Head kernels are
    # rescaled so scores spread enough for some boxes to clear the eval
    # threshold (σ=0.01 random heads give a near-uniform softmax).
    tree = _fake_chainer_tree(rng, num_classes=21, hidden=4096)
    # magnitude fix-ups so the random net produces DETECTIONS (σ=0.05
    # convs gain ~3.4x per layer through 13 layers → 1e6-scale
    # activations → astronomic RPN deltas → every proposal fails the
    # min-size filter → roi_valid all-false).  He-normalize the convs,
    # damp the delta heads, and grade class biases with background
    # lowest so foreground scores clear the 0.05 eval threshold.
    for k, v in list(tree.items()):
        if k.endswith("/W") and v.ndim == 4:
            fan_in = int(np.prod(v.shape[1:]))
            tree[k] = (v / v.std() * np.sqrt(2.0 / fan_in)).astype(
                np.float32)
    tree["rpn/rpn_bbox_pred/W"] = tree["rpn/rpn_bbox_pred/W"] * 0.1
    tree["bbox_pred/W"] = tree["bbox_pred/W"] * 0.1
    tree["cls_score/b"] = np.linspace(-3.0, 3.0, 21).astype(np.float32)
    npz_path = str(tmp_path / "VGG16_faster_rcnn_final.npz")
    np.savez(npz_path, **tree)

    # fc6 permutation applied on import (SURVEY §4.3 trap): the imported
    # flax kernel must equal the independent (O,C,H,W)->(H,W,C,O) permute
    from trcnn.config import voc_config
    from trcnn.convert import import_chainer_npz

    params = import_chainer_npz(npz_path, voc_config())
    w = tree["fc6/W"].reshape(4096, 512, 7, 7).transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        params["params"]["head"]["fc6"]["kernel"],
        w.reshape(7 * 7 * 512, 4096))
    del params, w

    # 2. VOC-format data tree
    voc_root, ids = _write_voc_tree(str(tmp_path / "VOC2007"), rng)

    # 3a. inference demo CLI
    out_img = str(tmp_path / "result.jpg")
    p = _run([PY, os.path.join(ROOT, "scripts", "forward.py"),
              "--img_fn", os.path.join(voc_root, "JPEGImages", "000001.jpg"),
              "--out_fn", out_img, "--pretrained_model", npz_path,
              "--score_thresh", "0.0"])
    assert os.path.exists(out_img)
    assert "inference:" in p.stdout

    # 3b. evaluation CLI with devkit detection-file export
    dets_dir = str(tmp_path / "dets")
    p = _run([PY, os.path.join(ROOT, "scripts", "evaluate.py"),
              "--dataset", "voc", "--dataset_root", voc_root,
              "--split", "test", "--pretrained_model", npz_path,
              "--batch_size", "2", "--write_dets", dets_dir])
    assert "mAP" in p.stdout

    # 4. devkit format: comp4_det_test_<class>.txt, lines
    #    "id score x1 y1 x2 y2", 1-based coords inside the image
    det_files = sorted(os.listdir(dets_dir))
    assert len(det_files) == 20, det_files  # one per foreground class
    n_lines = 0
    for fn in det_files:
        assert fn.startswith("comp4_det_test_") and fn.endswith(".txt")
        for line in open(os.path.join(dets_dir, fn)):
            parts = line.split()
            assert len(parts) == 6, line
            assert parts[0] in ids
            score = float(parts[1])
            x1, y1, x2, y2 = (float(v) for v in parts[2:])
            assert 0.0 <= score <= 1.0
            assert 1.0 <= x1 <= x2 <= 501.0
            assert 1.0 <= y1 <= y2 <= 376.0
            n_lines += 1
    assert n_lines > 0, "no detections cleared the eval score threshold"
