#!/usr/bin/env python3
"""Independent golden generator for the K3 morphology chain
(remove_small_objects -> remove_small_holes -> convex_hull_image -> label),
mirroring scikit-image semantics (skimage.morphology.misc / convex_hull_image
with offset_coordinates=True) in pure numpy. Deliberately different
algorithms from the Scala implementation (BFS labeling instead of union-find,
crossing-number point-in-polygon instead of half-plane tests) so agreement is
evidence of correctness, not transcription.

Prints Scala-ready golden literals for ImageKernelsSpec's morphology fixture.
"""
import sys
from collections import deque

import numpy as np


def label4(mask):
    """4-connected components, BFS. Returns (labels, sizes dict); 0 = bg."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=int)
    sizes = {}
    nxt = 1
    for sy in range(h):
        for sx in range(w):
            if mask[sy, sx] and labels[sy, sx] == 0:
                q = deque([(sy, sx)])
                labels[sy, sx] = nxt
                count = 0
                while q:
                    y, x = q.popleft()
                    count += 1
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w and mask[yy, xx] \
                                and labels[yy, xx] == 0:
                            labels[yy, xx] = nxt
                            q.append((yy, xx))
                sizes[nxt] = count
                nxt += 1
    return labels, sizes


def remove_small_objects(mask, min_size):
    labels, sizes = label4(mask)
    out = mask.copy()
    for lbl, size in sizes.items():
        if size < min_size:
            out[labels == lbl] = False
    return out


def remove_small_holes(mask, area_threshold):
    # skimage: ~remove_small_objects(~mask, area_threshold + 1)
    return ~remove_small_objects(~mask, area_threshold + 1)


def convex_hull_image(mask):
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros_like(mask)
    # diamond offsets per pixel (skimage offset_coordinates=True)
    pts = []
    for y, x in zip(ys, xs):
        pts += [(y - 0.5, x), (y + 0.5, x), (y, x - 0.5), (y, x + 0.5)]
    pts = sorted(set(pts))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    hull = []
    for p in pts:
        while len(hull) >= 2 and cross(hull[-2], hull[-1], p) <= 0:
            hull.pop()
        hull.append(p)
    lower = len(hull) + 1
    for p in reversed(pts):
        while len(hull) >= lower and cross(hull[-2], hull[-1], p) <= 0:
            hull.pop()
        hull.append(p)
    hull.pop()

    # crossing-number point-in-polygon on pixel centers; points on the
    # boundary (within tol of an edge) count as inside, like skimage's
    # grid_points_in_poly labels
    tol = 1e-10
    out = np.zeros_like(mask)
    m = len(hull)
    for y in range(h):
        for x in range(w):
            inside = False
            on_edge = False
            for i in range(m):
                (y1, x1), (y2, x2) = hull[i], hull[(i + 1) % m]
                # on-segment check via cross/dot products
                cr = (y2 - y1) * (x - x1) - (x2 - x1) * (y - y1)
                if abs(cr) < tol:
                    if min(y1, y2) - tol <= y <= max(y1, y2) + tol and \
                       min(x1, x2) - tol <= x <= max(x1, x2) + tol:
                        on_edge = True
                        break
                # ray casting: horizontal ray in +x, crossing edges by y-span
                if (y1 > y) != (y2 > y):
                    x_at = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                    if x < x_at:
                        inside = not inside
            out[y, x] = inside or on_edge
    return out


def label_main_feature(img):
    thresh = max(1.0, float(img.mean()))
    mask = img > thresh
    mask = remove_small_objects(mask, 20)
    mask = remove_small_holes(mask, 20)
    mask = convex_hull_image(mask)
    labels, sizes = label4(mask)
    if not sizes:
        return np.zeros_like(labels)
    best = max(sizes, key=lambda lbl: (sizes[lbl], -lbl))
    return (labels == best).astype(int)


def beam_fixture():
    """Disk beam with dead pixels inside + isolated spikes outside."""
    h = w = 24
    img = np.zeros((h, w), dtype=np.float32)
    cy = cx = 12.0
    for y in range(h):
        for x in range(w):
            if (y - cy) ** 2 + (x - cx) ** 2 <= 6.0 ** 2:
                img[y, x] = 100.0
    # dead pixels inside the beam (moly-style)
    img[11, 11] = 0.0
    img[12, 13] = 0.0
    img[10, 12] = 0.0
    # isolated spikes: 2x2 block + single hot pixel (both < 20 px)
    img[2, 20] = img[2, 21] = img[3, 20] = img[3, 21] = 5000.0
    img[20, 2] = 9000.0
    return img


def main():
    img = beam_fixture()
    labels = label_main_feature(img)
    area = int(labels.sum())
    weights = img * labels
    total = float(weights.sum())
    ys, xs = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    cy = float((weights * ys).sum() / total)
    cx = float((weights * xs).sum() / total)
    print(f"// golden from scripts/morph_golden.py (numpy, independent algo)")
    print(f"val goldenArea = {area}")
    print(f"val goldenCy = {cy!r}")
    print(f"val goldenCx = {cx!r}")
    print(f"val goldenIntensity = {total!r}")
    rows = ["\"" + "".join("#" if labels[y, x] else "." for x in range(img.shape[1])) + "\""
            for y in range(img.shape[0])]
    print("val goldenMask = Seq(\n  " + ",\n  ".join(rows) + ")")


if __name__ == "__main__":
    sys.exit(main())
