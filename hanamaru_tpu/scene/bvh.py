"""BVH construction and flattening for stackless TPU traversal.

Build parity with the reference's median-split construction
(reference: src/bvh.rs:107-211): sort primitive indices by a per-primitive
coordinate sum along the longest axis of the node AABB, split at len/2,
leaf when len/2 <= 2 (i.e. <= 5 primitives).  Mesh BVHs sort by the sum of
the three vertex coordinates (bvh.rs:121-145); element BVHs sort by
aabb.min + aabb.max (bvh.rs:169-193).

The tree is emitted as *threaded* flat arrays in depth-first order — each
node carries a hit link (next node when its AABB is hit: first child for
inner nodes) and a miss link (the DFS escape).  Traversal then needs no
per-ray stack: rays advance their node pointer in lockstep, which is the
vector-machine replacement for the reference's recursive descent
(bvh.rs:213-263).  Primitives are permuted into leaf order so every leaf
owns a contiguous [first, first+count) range.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

# Leaf when len // 2 <= 2, matching bvh.rs:111-114 — leaves hold 1..=5 prims.
_PARITY_LEAF_SPLIT = 2
LEAF_MAX = 5


class FlatBvh(NamedTuple):
    """Threaded BVH as numpy arrays (host) ready to ship to device."""

    aabb_min: np.ndarray   # [n, 3] f32
    aabb_max: np.ndarray   # [n, 3] f32
    hit_link: np.ndarray   # [n] i32: next node when AABB hit (-1 = done)
    miss_link: np.ndarray  # [n] i32: next node when AABB missed (-1 = done)
    first: np.ndarray      # [n] i32: first primitive (leaf) or -1
    count: np.ndarray      # [n] i32: primitive count (leaf) or 0
    order: np.ndarray      # [num_prims] i32: new-order -> original index
    depth: int             # max tree depth (for traversal bounds)


class _Node:
    __slots__ = ("mn", "mx", "left", "right", "prims")

    def __init__(self, mn, mx, left=None, right=None, prims=None):
        self.mn, self.mx = mn, mx
        self.left, self.right = left, right
        self.prims = prims


def _build(indices: np.ndarray, aabb_min, aabb_max, sort_key) -> _Node:
    mn = aabb_min[indices].min(axis=0)
    mx = aabb_max[indices].max(axis=0)
    mid = len(indices) // 2
    if mid <= _PARITY_LEAF_SPLIT:
        return _Node(mn, mx, prims=indices)
    ext = mx - mn
    # longest-axis pick with the reference's strict-comparison tie-breaking
    # (bvh.rs:121-145): x wins only if strictly greater than y and z, then y,
    # else z.
    if ext[0] > ext[1] and ext[0] > ext[2]:
        axis = 0
    elif ext[1] > ext[0] and ext[1] > ext[2]:
        axis = 1
    else:
        axis = 2
    order = indices[np.argsort(sort_key[indices, axis], kind="stable")]
    return _Node(
        mn,
        mx,
        left=_build(order[:mid], aabb_min, aabb_max, sort_key),
        right=_build(order[mid:], aabb_min, aabb_max, sort_key),
    )


def _flatten(root: _Node) -> FlatBvh:
    mins, maxs, hit, miss, first, count = [], [], [], [], [], []
    order: list[np.ndarray] = []

    def emit(node: _Node, escape: int, depth: int) -> int:
        i = len(mins)
        mins.append(node.mn)
        maxs.append(node.mx)
        hit.append(0)     # patched below
        miss.append(escape)
        if node.prims is not None:
            first.append(sum(len(o) for o in order))
            count.append(len(node.prims))
            order.append(node.prims)
            hit[i] = escape            # leaf: prims tested in-node, then escape
            return depth
        first.append(-1)
        count.append(0)
        hit[i] = i + 1                 # inner: descend into first child
        d1 = emit(node.left, -2, depth + 1)     # escape patched after right idx known
        left_slot = i + 1
        right_idx = len(mins)
        _patch_escape(left_slot, right_idx)
        d2 = emit(node.right, escape, depth + 1)
        return max(d1, d2)

    def _patch_escape(node_idx: int, escape: int) -> None:
        # fix the left subtree's exits that point at the placeholder -2
        j = node_idx
        while j < len(mins):
            if miss[j] == -2:
                miss[j] = escape
            if first[j] >= 0 and hit[j] == -2:
                hit[j] = escape
            j += 1

    depth = emit(root, -1, 1)
    return FlatBvh(
        aabb_min=np.asarray(mins, dtype=np.float32),
        aabb_max=np.asarray(maxs, dtype=np.float32),
        hit_link=np.asarray(hit, dtype=np.int32),
        miss_link=np.asarray(miss, dtype=np.int32),
        first=np.asarray(first, dtype=np.int32),
        count=np.asarray(count, dtype=np.int32),
        order=(
            np.concatenate(order).astype(np.int32)
            if order
            else np.zeros((0,), np.int32)
        ),
        depth=depth,
    )


def build_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray, sort_key: np.ndarray) -> FlatBvh:
    """Generic threaded-BVH build over N primitives.

    aabb_min/max: [N,3] per-primitive bounds.
    sort_key: [N,3] per-primitive, per-axis ordering key (vertex-coordinate
    sum for triangles, aabb.min+aabb.max for whole elements — see module doc).
    """
    import os

    if os.environ.get("HANAMARU_NO_NATIVE") != "1":
        from . import native

        built = native.build_bvh(aabb_min, aabb_max, sort_key)
        if built is not None:
            return built

    n = len(aabb_min)
    if n == 0:
        return FlatBvh(
            np.zeros((1, 3), np.float32),
            np.zeros((1, 3), np.float32),
            np.full((1,), -1, np.int32),
            np.full((1,), -1, np.int32),
            np.zeros((1,), np.int32),
            np.zeros((1,), np.int32),
            np.zeros((0,), np.int32),
            1,
        )
    root = _build(np.arange(n), np.asarray(aabb_min), np.asarray(aabb_max), np.asarray(sort_key))
    return _flatten(root)


def build_triangle_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> FlatBvh:
    """BVH over triangles given [T,3] vertex arrays."""
    aabb_min = np.minimum(np.minimum(v0, v1), v2)
    aabb_max = np.maximum(np.maximum(v0, v1), v2)
    sort_key = v0 + v1 + v2   # bvh.rs:125-126 vertex-coordinate sum
    return build_bvh(aabb_min, aabb_max, sort_key)


# ---------------------------------------------------------------------------
# Binned-SAH builder (quality path).  Same threaded flat output; hit results
# are identical to the parity builder's by construction (the closest-hit
# search is exact over any valid tree) — only traversal cost changes.
# ---------------------------------------------------------------------------
_SAH_BINS = 16


def _half_area(mn, mx) -> float:
    e = mx - mn
    return float(e[0] * e[1] + e[1] * e[2] + e[2] * e[0])


def _build_sah(indices: np.ndarray, amin, amax, cent) -> _Node:
    mn = amin[indices].min(axis=0)
    mx = amax[indices].max(axis=0)
    n = len(indices)
    if n <= 2:
        return _Node(mn, mx, prims=indices)
    c = cent[indices]
    cmn = c.min(axis=0)
    cmx = c.max(axis=0)
    axis = int(np.argmax(cmx - cmn))
    ext = float(cmx[axis] - cmn[axis])

    def split_at(order, mid):
        return _Node(
            mn, mx,
            left=_build_sah(order[:mid], amin, amax, cent),
            right=_build_sah(order[mid:], amin, amax, cent),
        )

    if ext <= 0.0:
        # coincident centroids: SAH cannot separate
        if n <= LEAF_MAX:
            return _Node(mn, mx, prims=indices)
        return split_at(indices, n // 2)

    inv = np.float32(_SAH_BINS) / np.float32(ext)
    bins = np.clip(
        ((c[:, axis] - cmn[axis]) * inv).astype(np.int32), 0, _SAH_BINS - 1
    )
    bc = np.bincount(bins, minlength=_SAH_BINS)
    bin_mn = np.full((_SAH_BINS, 3), np.inf, np.float64)
    bin_mx = np.full((_SAH_BINS, 3), -np.inf, np.float64)
    for b in np.unique(bins):
        sel = bins == b
        bin_mn[b] = amin[indices[sel]].min(axis=0)
        bin_mx[b] = amax[indices[sel]].max(axis=0)

    # prefix/suffix bounds over bins -> SAH cost of every split k
    l_mn = np.minimum.accumulate(bin_mn, axis=0)
    l_mx = np.maximum.accumulate(bin_mx, axis=0)
    r_mn = np.minimum.accumulate(bin_mn[::-1], axis=0)[::-1]
    r_mx = np.maximum.accumulate(bin_mx[::-1], axis=0)[::-1]
    l_cnt = np.cumsum(bc)
    r_cnt = n - l_cnt
    best_cost, best_k = np.inf, -1
    for k in range(1, _SAH_BINS):
        if l_cnt[k - 1] == 0 or r_cnt[k - 1] == 0:
            continue
        cost = l_cnt[k - 1] * _half_area(l_mn[k - 1], l_mx[k - 1]) + r_cnt[
            k - 1
        ] * _half_area(r_mn[k], r_mx[k])
        if cost < best_cost:
            best_cost, best_k = cost, k

    if best_k < 0 or (n <= LEAF_MAX and best_cost >= n * _half_area(mn, mx)):
        if n <= LEAF_MAX:
            return _Node(mn, mx, prims=indices)
        order = indices[np.argsort(c[:, axis], kind="stable")]
        return split_at(order, n // 2)

    near = bins < best_k
    order = np.concatenate([indices[near], indices[~near]])
    mid = int(near.sum())
    if mid == 0 or mid == n:  # numeric edge guard
        mid = n // 2
    return split_at(order, mid)


def build_bvh_sah(aabb_min: np.ndarray, aabb_max: np.ndarray) -> FlatBvh:
    """Binned-SAH threaded BVH over N primitives (the quality/speed path;
    `build_bvh` keeps the reference's median-split construction)."""
    import os

    if os.environ.get("HANAMARU_NO_NATIVE") != "1":
        from . import native

        built = native.build_bvh_sah(aabb_min, aabb_max)
        if built is not None:
            return built

    n = len(aabb_min)
    if n == 0:
        return build_bvh(aabb_min, aabb_max, np.zeros((0, 3)))
    amin = np.asarray(aabb_min, np.float32)
    amax = np.asarray(aabb_max, np.float32)
    cent = amin + amax
    root = _build_sah(np.arange(n), amin, amax, cent)
    return _flatten(root)


def build_triangle_bvh_sah(v0, v1, v2) -> FlatBvh:
    """SAH BVH over triangles given [T,3] vertex arrays."""
    aabb_min = np.minimum(np.minimum(v0, v1), v2)
    aabb_max = np.maximum(np.maximum(v0, v1), v2)
    return build_bvh_sah(aabb_min, aabb_max)


def octant_links(flat: FlatBvh) -> tuple[np.ndarray, np.ndarray]:
    """Per-direction-octant threaded links for front-to-back traversal.

    The canonical hit/miss links visit children in build order, so the
    closest-hit pruning in the traversal loop (intersect.py) rarely fires.
    These [8, n] tables re-thread the SAME tree once per ray-direction
    octant (bit k set = d[k] < 0) so that the *near* child — judged by the
    axis along which the two children's centroids separate most, which
    works for any builder (median-split or SAH) — is always visited first.
    Traversal results are bit-identical (both children are still visited
    whenever their AABB is hit); only the visit order, and therefore how
    early t shrinks, changes.

    Derivation needs no tree: in the canonical DFS layout, an inner node i
    has left child i+1, and the left child's miss link (its escape) is the
    right child's index.
    """
    import os

    if os.environ.get("HANAMARU_NO_NATIVE") != "1":
        from . import native

        out = native.octant_links(flat)
        if out is not None:
            return out
    return octant_links_py(flat)


def octant_links_py(flat: FlatBvh) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python reference implementation of `octant_links`."""
    n = len(flat.hit_link)
    hit_c = flat.hit_link
    miss_c = flat.miss_link
    count = flat.count
    is_leaf = (count > 0) | (hit_c == -1)
    centroid = flat.aabb_min + flat.aabb_max   # x2, only compared

    # per inner node: children, separation axis, and whether the LEFT child
    # is the near one for a positive ray direction along that axis
    lefts = np.arange(1, n + 1, dtype=np.int32)
    rights = np.where(lefts < n, miss_c[np.minimum(lefts, n - 1)], 0)
    diff = centroid[np.minimum(rights, n - 1)] - centroid[np.minimum(lefts, n - 1)]
    axis = np.argmax(np.abs(diff), axis=1).astype(np.int32)
    left_is_near_pos = diff[np.arange(n), axis] >= 0.0

    hit8 = np.empty((8, n), np.int32)
    miss8 = np.empty((8, n), np.int32)
    for o in range(8):
        neg = ((o >> axis) & 1).astype(bool)  # d negative along sep axis
        left_near = left_is_near_pos ^ neg
        escape = np.full(n, -1, np.int32)     # escape[root] = -1
        H = hit8[o]
        M = miss8[o]
        for i in range(n):
            e = escape[i]
            if is_leaf[i]:
                H[i] = e
                M[i] = e
                continue
            left = i + 1
            right = miss_c[left]
            near, far = (left, right) if left_near[i] else (right, left)
            H[i] = near
            M[i] = e
            escape[near] = far
            escape[far] = e
    return hit8, miss8
