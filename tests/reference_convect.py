"""Loop-based numpy oracle of the reference's convective-adjustment and
temperature-iteration host logic (source/host_functions.py:337-635,
source/kernels.cu:2606-2884), used to test the device-side segmented-scan
reimplementation in helios_tpu.rce."""

import numpy as np

P_TOP_IGNORE = 1e1


def conv_check(T_lay, p_lay, p_int, kappa_lay, kappa_int):
    # host_functions.py:337-362
    L = len(T_lay) - 1
    unstable = np.zeros(L + 1, bool)
    for i in range(L - 1):
        if p_lay[i] <= P_TOP_IGNORE:
            break
        T_between = T_lay[i] * (p_int[i + 1] / p_lay[i]) ** (
            kappa_lay[i] * (1 + 1e-6))
        T_ad = T_between * (p_lay[i + 1] / p_int[i + 1]) ** (
            kappa_int[i + 1] * (1 + 1e-6))
        if T_lay[i + 1] < T_ad:
            unstable[i] = True
            unstable[i + 1] = True
    T_ad = T_lay[L] * (p_lay[0] / p_int[0]) ** (kappa_int[0] * (1 + 1e-6))
    if T_lay[0] < T_ad:
        unstable[L] = True
        unstable[0] = True
    return unstable


def mark_convective_layers(T_lay, p_lay, p_int, kappa_lay, kappa_int,
                           conv_layer, stitching, iter_value):
    # host_functions.py:545-582 (sequential semantics, incl. persistent
    # conv_layer array)
    L = len(T_lay) - 1
    conv = conv_layer.copy()
    conv[L] = 0
    conv[0] = 0
    for i in range(L - 1):
        if p_lay[i] <= P_TOP_IGNORE:
            break
        T_between = T_lay[i] * (p_int[i + 1] / p_lay[i]) ** (
            kappa_lay[i] * (1 - 1e-6))
        T_ad = T_between * (p_lay[i + 1] / p_int[i + 1]) ** (
            kappa_int[i + 1] * (1 - 1e-6))
        if T_lay[i + 1] < T_ad:
            conv[i] = 1
            conv[i + 1] = 1
        else:
            conv[i + 1] = 0
    for i in range(L - 1):
        if T_lay[i + 1] > T_lay[i]:
            conv[i] = 0
    T_ad = T_lay[L] * (p_lay[0] / p_int[0]) ** (kappa_int[0] * (1 - 1e-6))
    if T_lay[0] < T_ad:
        conv[L] = 1
        conv[0] = 1
    if stitching and iter_value > 5000:
        conv = stitching_holes(conv, p_lay, p_int)
    return conv


def _zone_lists(flags, L):
    """start/end layer lists with the ghost-as-(-1) convention
    (host_functions.py:371-395, :588-616)."""
    lst = [i for i in range(L + 1) if flags[i]]
    if L in lst:
        lst = list(np.insert(lst[:-1], 0, -1))
    starts, ends = [], []
    for i in range(len(lst)):
        if lst[i] - 1 not in lst:
            starts.append(lst[i])
        if lst[i] + 1 not in lst:
            ends.append(lst[i])
    return starts, ends


def stitching_holes(conv, p_lay, p_int):
    # host_functions.py:585-635
    L = len(conv) - 1
    conv = conv.copy()
    start_layers, end_layers = [], []
    for i in range(L):
        if conv[i]:
            if i > 0:
                if not conv[i - 1]:
                    start_layers.append(i)
            elif i == 0:
                if not conv[L]:
                    start_layers.append(i)
            if i < L - 1:
                if not conv[i + 1]:
                    end_layers.append(i)
            elif i == L - 1:
                end_layers.append(i)
    if conv[L]:
        start_layers.append(L)
        start_layers = list(np.insert(start_layers[:-1], 0, -1))
        if not conv[0]:
            end_layers.append(L)
            end_layers = list(np.insert(end_layers[:-1], 0, -1))
    assert len(start_layers) == len(end_layers)
    for n in range(len(start_layers) - 1):
        p_top = p_lay[start_layers[n + 1]]
        p_bot = p_lay[end_layers[n]] if end_layers[n] != -1 else p_int[0]
        if (p_top / p_bot) > (1 / np.e):
            for mm in range(end_layers[n] + 1, start_layers[n + 1]):
                conv[mm] = 1
    return conv


def conv_correct(T_lay, p_lay, p_int, kappa_lay, kappa_int, c_p_lay,
                 meanmolmass_lay, conv_unstable, conv_layer, fudging, *,
                 T_star=0.0, input_dampara="automatic", F_intern=0.0,
                 F_add_heat_sum=None, F_smooth_sum=None, F_down_tot=None,
                 F_up_tot=None):
    # host_functions.py:368-506
    L = len(T_lay) - 1
    T = T_lay.copy()
    flags = conv_unstable | conv_layer
    start_layers, end_layers = _zone_lists(flags, L)
    assert len(start_layers) == len(end_layers)

    fudge = np.ones(len(start_layers))
    if fudging:
        for n in range(len(start_layers)):
            itf = None
            for m in range(n, len(start_layers)):
                if m != len(start_layers) - 1:
                    p_top = p_lay[start_layers[m + 1]]
                    p_bot = (p_lay[end_layers[m]] if end_layers[m] != -1
                             else p_int[0])
                    if (p_top / p_bot) < (1 / np.e):
                        itf = int((end_layers[m] + start_layers[m + 1]) / 2)
                        break
                else:
                    itf = int(0.8 * end_layers[m] + 0.2 * L)
            if input_dampara == "automatic":
                if T_star > 10:
                    dampara = 0.5 if n < len(start_layers) - 1 else 4.0
                else:
                    dampara = 8.0
            else:
                dampara = float(input_dampara)
            f = ((F_intern + F_add_heat_sum[itf - 1] + F_smooth_sum[itf - 1]
                  + F_down_tot[itf]) / F_up_tot[itf]) ** (1.0 / dampara)
            fudge[n] = min(1.01, max(0.99, f))

    for n in range(len(start_layers)):
        num = 0.0
        denom = 0.0
        s = max(0, start_layers[n])
        e = max(0, end_layers[n])
        for i in range(s, e + 1):
            num += (c_p_lay[i] / meanmolmass_lay[i] * T[i]
                    * (p_int[i] - p_int[i + 1]))
            de = 1.0
            if i != s:
                for j in range(s, i):
                    de *= ((p_lay[j] / p_int[j]) ** kappa_int[j]
                           * (p_int[j + 1] / p_lay[j]) ** kappa_lay[j])
            de *= ((p_lay[i] / p_int[i]) ** kappa_int[i]
                   * c_p_lay[i] / meanmolmass_lay[i]
                   * (p_int[i] - p_int[i + 1]))
            denom += de
        mean_pot = num / denom * fudge[n]
        for i in range(s, e + 1):
            factor = 1.0
            if i != s:
                for j in range(s, i):
                    factor *= ((p_lay[j] / p_int[j]) ** kappa_int[j]
                               * (p_int[j + 1] / p_lay[j]) ** kappa_lay[j])
            factor *= (p_lay[i] / p_int[i]) ** kappa_int[i]
            T[i] = mean_pot * factor
        if start_layers[n] == -1:
            T[L] = mean_pot
    return T


def convective_adjustment(T_lay, p_lay, p_int, kappa_lay, kappa_int,
                          c_p_lay, meanmolmass_lay, iter_value, **fudge_kw):
    # host_functions.py:509-542
    L = len(T_lay) - 1
    T = T_lay.copy()
    conv_layer = np.zeros(L + 1, bool)
    unstable = conv_check(T, p_lay, p_int, kappa_lay, kappa_int)
    while unstable.any():
        conv_layer = mark_convective_layers(T, p_lay, p_int, kappa_lay,
                                            kappa_int, conv_layer, 0,
                                            iter_value)
        T = conv_correct(T, p_lay, p_int, kappa_lay, kappa_int, c_p_lay,
                         meanmolmass_lay, unstable, conv_layer, 0)
        unstable = conv_check(T, p_lay, p_int, kappa_lay, kappa_int)
    conv_layer = mark_convective_layers(T, p_lay, p_int, kappa_lay,
                                        kappa_int, conv_layer, 1, iter_value)
    T = conv_correct(T, p_lay, p_int, kappa_lay, kappa_int, c_p_lay,
                     meanmolmass_lay, unstable, conv_layer, 1, **fudge_kw)
    return T, conv_layer


def rad_temp_iter(F_down_tot, F_net, T_lay, p_lay, p_int, T_store,
                  prefactor, F_add_heat_lay, F_add_heat_sum, itervalue, *,
                  foreplay, local_limit, adapt_interval, smooth, dim, step,
                  F_intern, no_atmo=0):
    # kernels.cu:2606-2763 (adaptive pseudo-timestep branch; smoothing)
    L = len(T_lay) - 1
    T = T_lay.copy()
    Ts = T_store.copy()
    pref = prefactor.copy()
    abort = np.zeros(L + 1, bool)
    F_smooth = np.zeros(L)
    F_smooth_sum = np.zeros(L)
    if smooth:
        for i in range(L):
            t_mid = T[i]
            if p_lay[i] < 1e6 and 0 < i < L - 1:
                t_mid = (T[i - 1] + T[i + 1]) / 2.0
            F_smooth[i] = (t_mid - T[i]) ** 7.0
        F_smooth_sum = np.cumsum(F_smooth)

    for i in range(L + 1):
        if i < L:
            c = F_net[i] - F_net[i + 1] + F_add_heat_lay[i] + F_smooth[i]
        else:
            c = F_intern - F_net[0]
            if (abs(F_intern - F_net[1]) / (F_down_tot[L] + F_intern)
                    > 0.5 * local_limit):
                c = F_intern - F_net[1]
        if itervalue == foreplay:
            pref[i] = 1.0
        if itervalue == 10000:
            pref[i] = 1e-1
        delta_T = 0.0
        if c != 0:
            delta_t = pref[i] * p_lay[0] / abs(c) ** 0.9
            delta_T = c / (p_int[0] - p_int[1]) * delta_t
        if abs(delta_T) > 500.0:
            delta_T = 500.0 * np.sign(c)
        if itervalue % adapt_interval == 0:
            Ts[i] = T[i]
        if itervalue % adapt_interval == adapt_interval - 1:
            if abs(T[i] - Ts[i]) < adapt_interval / 2.0 * abs(delta_T):
                pref[i] /= 1.5
            else:
                pref[i] *= 1.1
        T[i] = T[i] + delta_T
        if no_atmo and i != L:
            T[i] = 1.001
        T[i] = min(max(T[i], 1.001), dim * step - 1.001)
        if i < L:
            cond = (abs(F_intern + F_add_heat_sum[i] + F_smooth_sum[i]
                        - F_net[i + 1]) / (F_down_tot[L] + F_intern)
                    < local_limit)
        else:
            cond = (abs(F_intern - F_net[0]) / (F_down_tot[L] + F_intern)
                    < local_limit)
        abort[i] = cond
    return T, Ts, pref, F_smooth_sum, abort
