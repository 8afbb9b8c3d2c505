"""Offline multi-view-stereo data preparation (vismvsnet replacement).

The reference ships a ~2,900 LoC Vis-MVSNet fork (/root/reference/vismvsnet/)
whose inference needs a pretrained torch checkpoint that is stripped from the
snapshot (`pretrained_model/.MISSING_LARGE_BLOBS`). This package provides the
same four-stage offline pipeline (run_pre.sh:6-9) with a TPU-native,
weight-free core:

  1. `colmap_to_mvs`  — COLMAP model → MVSNet `cams/*_cam.txt` + `pair.txt`
                        (colmap2mvsnet.py semantics: 1%/99% depth range,
                        angle-gaussian view-selection score)
  2. `plane_sweep`    — cascade ZNCC plane-sweep stereo in JAX (replaces the
                        pretrained cascade network of test.py): 3 stages at
                        1/4, 1/2, 1/1 resolution, streaming soft-argmin,
                        per-stage probability maps
  3. `filter_fuse`    — photometric (3-stage prob threshold) + geometric
                        (>=vthresh-view reprojection consistency) filtering
                        (filter.py:83-117 semantics)
  4. `prepare`        — depth→normal + `extra/{depths,normals}` packaging
                        consumed by scene/dataset_readers.py's Blender MVS
                        branch, or the NeILF inputs layout
"""
from .colmap_to_mvs import colmap_to_mvs
from .filter_fuse import geometric_filter, prob_filter
from .formats import (load_cam_txt, load_pair_txt, write_cam_txt,
                      write_pair_txt)
from .plane_sweep import infer_depth
from .prepare import depth_to_normal, prepare_blender_extra

__all__ = [
    "colmap_to_mvs", "geometric_filter", "prob_filter",
    "load_cam_txt", "load_pair_txt", "write_cam_txt", "write_pair_txt",
    "infer_depth", "depth_to_normal", "prepare_blender_extra",
]
