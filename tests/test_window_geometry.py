"""Property tests for the bin-packed tile-layout vision geometry
(qwen2vl.vision_geometry + qwen2vl_adapter._padded_geometry).

The tile layout re-orders the WHOLE tower row domain on the host; these
invariants are what make the device program exact with zero gathers:
  1. patch content round-trips: gathering patches with perm_tile and
     un-permuting merged groups with the composed reverse reproduces the
     original merged-token order exactly;
  2. no window straddles a 128-row tile boundary, and window runs start
     at merge_unit-aligned slots (merge groups stay intact);
  3. attention visibility is preserved: two rows share a window segment
     inside a tile iff they shared a window in window order.

Reference semantics being matched: HF get_window_index windowed attention
(modeling_qwen2_5_vl.py:336-404), consumed by the reference's
qwen2vl_model.py scoring path.
"""

import numpy as np
import pytest

from t2v_metrics_tpu.models import qwen2vl as q
from t2v_metrics_tpu.models.qwen2vl_adapter import (_padded_geometry,
                                                    _bucket, PATCH_BUCKETS)

CFG = q.QWEN2_VL_MODELS["qwen2.5-vl-test"]["config"].vision
GRIDS = [
    (1, 6, 10),    # ragged both dims
    (1, 8, 8),     # exact multiple of window
    (2, 6, 8),     # multi-frame, one ragged dim
    (1, 2, 2),     # single window, minimum grid
    (3, 10, 6),    # taller than wide, ragged
]


@pytest.mark.parametrize("grid", GRIDS)
def test_tile_layout_invariants(grid):
    mu = CFG.merge_unit
    s = int(np.prod(grid))
    sb = _bucket(s, PATCH_BUCKETS)
    geom, pos_hw, win_seg, full_seg, reverse, tiled = _padded_geometry(
        CFG, grid, s, sb)
    if not tiled:
        pytest.skip("tile layout disabled for this config")

    perm_tile = geom["perm_tile"]
    assert len(perm_tile) == sb and len(win_seg) == sb
    assert len(reverse) == sb // mu

    # (1) content round-trip: row i of original merged token k must land
    # where the composed reverse says it does
    rows = np.arange(s, dtype=np.int64)
    tiled_rows = perm_tile  # tile slot -> original patch row
    for k in range(s // mu):
        base = reverse[k] * mu
        np.testing.assert_array_equal(tiled_rows[base: base + mu],
                                      rows[k * mu: k * mu + mu])

    # (2) window runs: same window id => same tile, contiguous slots,
    # start aligned to merge_unit
    slots = np.arange(sb)
    for w in np.unique(win_seg[win_seg >= 0]):
        ws = slots[win_seg == w]
        assert ws.max() - ws.min() + 1 == len(ws)          # contiguous
        assert ws.min() // 128 == ws.max() // 128          # one tile
        assert ws.min() % mu == 0                          # merge-aligned

    # (3) visibility equivalence vs window-order segments
    wo_seg = geom["win_seg"]                     # (s,) window-order segs
    # map original patch row -> its window id via window order
    perm = geom["perm"]                          # window order -> original
    orig_seg = np.empty(s, np.int64)
    orig_seg[perm] = wo_seg
    tile_of = slots // 128
    for a in range(0, s, max(1, s // 37)):       # sampled rows
        sa = slots[(win_seg >= 0) & (perm_tile == a)]
        assert len(sa) == 1
        visible = perm_tile[(tile_of == tile_of[sa[0]])
                            & (win_seg == win_seg[sa[0]])]
        expect = np.where(orig_seg == orig_seg[a])[0]
        np.testing.assert_array_equal(np.sort(visible), np.sort(expect))

    # full_seg: true slots visible to each other, pads excluded
    assert (full_seg[win_seg >= 0] == 0).all()
    assert (full_seg[win_seg < 0] == -1).all()


def test_tile_layout_occupancy_video_grid():
    """The video bench grid must bin-pack with zero extra tiles vs the
    patch bucket (the layout's compute cost must not exceed the old
    segment-masked path's bucket)."""
    grid = (8, 18, 22)   # 16f @ 252x308 -> 3168 patches (bench shape)
    s = int(np.prod(grid))
    sb = _bucket(s, PATCH_BUCKETS)
    cfg3b = q.QWEN2_VL_MODELS["qwen2.5-vl-3b"]["config"].vision
    geom = q.vision_geometry(grid, cfg3b)
    nt_rows = len(geom["win_gather"])
    assert nt_rows <= sb, (nt_rows, sb)
