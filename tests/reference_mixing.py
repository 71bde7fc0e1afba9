"""Numpy oracle of the reference's Random Overlap kernel
(source/kernels.cu:3263-3399), faithful to its sequential rebinning loop."""

import numpy as np


def add_to_mixed_opac_cell(mixed, new, gauss_weight, gauss_y, s, ro_method):
    """One (bin, layer) cell of add_to_mixed_opac.  mixed/new: [ny]
    (new already VMR*mass/meanmolmass weighted)."""
    ny = len(mixed)
    negligible = (0.01 * mixed[0] > new[ny - 1]) or (0.01 * new[0]
                                                     > mixed[ny - 1])
    if ro_method == 0 or s == 0 or negligible or ny == 1:
        return mixed + new

    # all 400 pairwise sums (the reference's y_intersect fill trick only
    # permutes the array before its insertion sort; multiset identical)
    sums = (mixed[:, None] + new[None, :]).ravel()
    wts = ((0.5 * gauss_weight[:, None])
           * (0.5 * gauss_weight[None, :])).ravel()
    order = np.argsort(sums, kind="stable")
    k = sums[order]
    w = wts[order]

    n2 = ny * ny
    yg = np.empty(n2)
    yg[0] = 0.5 * w[0]
    for i in range(1, n2):
        yg[i] = yg[i - 1] + 0.5 * w[i - 1] + 0.5 * w[i]

    out = mixed.copy()  # unset values stay (device array not overwritten)
    y = 0
    for ww in range(1, n2):
        if yg[ww] > gauss_y[y]:
            out[y] = (k[ww - 1] * (yg[ww] - gauss_y[y])
                      + k[ww] * (gauss_y[y] - yg[ww - 1])) / (yg[ww]
                                                              - yg[ww - 1])
            if y < ny - 1:
                y += 1
            else:
                break
    return out
