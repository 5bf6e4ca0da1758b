"""Sort-Tile-Recursive (STR) packed R-tree — bulk load + batch query.

The reference's joins are O(N·M) nested loops with no index
(SpaVectors.py:964-983). The north rule replaces that with
"ray-casting with STRtree-pruned candidate sets broadcast to actor
pools". This is that tree: bulk-loaded once on the driver from the
polygon side's bboxes, ``ray.put`` into the object store, and queried
per Arrow batch inside join actors.

STR packing (Leutenegger et al. 1997, public): sort rect centers by x
into vertical slices, sort each slice by y, pack runs of ``cap`` into
nodes; recurse. Queries are vectorized over whole point/box batches —
a (point, node) frontier expanded level by level with numpy, no
per-point Python recursion.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Packed R-tree over axis-aligned boxes [n, 4] = (minx, miny, maxx, maxy)."""

    def __init__(self, boxes: np.ndarray, cap: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.boxes = boxes
        self.cap = int(cap)
        n = len(boxes)
        if n == 0:
            self.levels: list[np.ndarray] = [np.zeros((0, 4))]
            self.order = np.zeros(0, dtype=np.int64)
            return
        # --- STR packing of the leaf order
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        nleaf = -(-n // self.cap)                    # number of leaves
        nslice = int(np.ceil(np.sqrt(nleaf)))        # vertical slices
        per_slice = nslice * self.cap
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        for s in range(0, n, per_slice):
            sl = by_x[s:s + per_slice]
            order[s:s + len(sl)] = sl[np.argsort(cy[sl], kind="stable")]
        self.order = order                           # leaf slot -> box index
        # --- build levels bottom-up; levels[0] = leaf boxes in packed order
        self.levels = [boxes[order]]
        while len(self.levels[-1]) > 1:
            child = self.levels[-1]
            m = -(-len(child) // self.cap)
            parent = np.empty((m, 4))
            for i in range(m):
                blk = child[i * self.cap:(i + 1) * self.cap]
                parent[i] = (blk[:, 0].min(), blk[:, 1].min(),
                             blk[:, 2].max(), blk[:, 3].max())
            self.levels.append(parent)
        self.levels.reverse()                        # levels[0] = root

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate pairs (point_idx, box_idx) with point inside box bbox.

        Node-at-a-time traversal: the Python loop runs once per
        *visited tree node* (pruned, few), while each visit filters its
        candidate point subset with one vectorized compare — no
        (points × fanout) index materialization.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        if n == 0 or len(self.order) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        last = len(self.levels) - 1
        out_pi: list[np.ndarray] = []
        out_bi: list[np.ndarray] = []
        stack: list[tuple[int, int, np.ndarray]] = [(0, 0, np.arange(n, dtype=np.int64))]
        while stack:
            lvl, node, idx = stack.pop()
            b = self.levels[lvl][node]
            x, y = px[idx], py[idx]
            sel = idx[(x >= b[0]) & (x <= b[2]) & (y >= b[1]) & (y <= b[3])]
            if len(sel) == 0:
                continue
            if lvl == last:
                out_pi.append(sel)
                out_bi.append(np.full(len(sel), self.order[node], dtype=np.int64))
            else:
                lo = node * self.cap
                hi = min(lo + self.cap, len(self.levels[lvl + 1]))
                for child in range(lo, hi):
                    stack.append((lvl + 1, child, sel))
        if not out_pi:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        return np.concatenate(out_pi), np.concatenate(out_bi)

    def query_boxes(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate pairs (query_idx, box_idx) with bbox overlap."""
        q = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        n = len(q)
        if n == 0 or len(self.order) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        last = len(self.levels) - 1
        qx0, qy0, qx1, qy1 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        out_qi: list[np.ndarray] = []
        out_bi: list[np.ndarray] = []
        stack: list[tuple[int, int, np.ndarray]] = [(0, 0, np.arange(n, dtype=np.int64))]
        while stack:
            lvl, node, idx = stack.pop()
            b = self.levels[lvl][node]
            sel = idx[(qx0[idx] <= b[2]) & (qx1[idx] >= b[0]) &
                      (qy0[idx] <= b[3]) & (qy1[idx] >= b[1])]
            if len(sel) == 0:
                continue
            if lvl == last:
                out_qi.append(sel)
                out_bi.append(np.full(len(sel), self.order[node], dtype=np.int64))
            else:
                lo = node * self.cap
                hi = min(lo + self.cap, len(self.levels[lvl + 1]))
                for child in range(lo, hi):
                    stack.append((lvl + 1, child, sel))
        if not out_qi:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        return np.concatenate(out_qi), np.concatenate(out_bi)
