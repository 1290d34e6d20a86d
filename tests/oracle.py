"""NumPy oracle restating the *reference semantics* (SURVEY.md §3, §5).

This is an independent re-statement of the math the reference executes —
per-node loops and all — used as the ground truth for parity tests. It is
deliberately written in the reference's own loop order so sequential
float32 association matches, and it encodes the N1/N3/N6/N9 quirk tables.
Deterministic only (dropout off): reference eval is stochastic (N2), so
parity is defined with dropout disabled (SURVEY §7 "RNG parity").
"""

from __future__ import annotations

import numpy as np

SIGMOID_SKIPPED_UNDER_NEW_SIGMOID = {
    "mean3", "max", "min", "softmax", "softmin", "std", "normalized_mean",
}


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_gcn(x, adj, w, b):
    """GraphConvolution.forward (layers.py:38-45): spmm(adj, x@w) + b."""
    return adj @ (x @ w) + b


def oracle_mma_aggregator(name, h, add_all, mask_w, activation="new_sigmoid"):
    """One learnable_* aggregator (layers.py:201-728), deterministic."""
    n, f = h.shape
    outs = np.zeros((n, f), h.dtype)
    for i in range(n):
        nbrs = np.asarray(add_all[i], np.int64)
        aa = h[i]
        bb = h[nbrs]  # (deg, F)
        cen_nei = np.concatenate([np.tile(aa, (len(nbrs), 1)), bb], axis=1)
        mask0 = cen_nei @ mask_w
        applies_sig = not (
            activation == "new_sigmoid" and name in SIGMOID_SKIPPED_UNDER_NEW_SIGMOID
        )
        if applies_sig:
            mask0 = sigmoid(mask0)
        s = np.sum(mask0 * bb, axis=0)  # masked neighbor sum
        family = name.rstrip("234")
        if family == "sum":
            outs[i] = aa + s
        elif family == "mean":
            outs[i] = (aa + s) / len(nbrs)
        elif family == "max":
            outs[i] = np.maximum(aa, s)
        elif family == "min":
            outs[i] = np.minimum(aa, s)
        elif name in ("softmax", "softmin"):
            # layers.py:676-685,716-720 — softmax over a singleton dim ⇒ s.
            outs[i] = s
        else:
            raise NotImplementedError(name)
    return outs


def oracle_mma_forward(h, adj, add_all, mask_ws, w, b, aggregators,
                       activation="new_sigmoid"):
    """MMA.forward (layers.py:853-867) with degenerate scalers (N3).

    m = cat_k aggregate_k → tri-identity scalers → tiled weight → tiled
    adjacency spmm. Computed literally (concat + tile), not via the
    algebraic collapse, so it independently checks the framework's math.
    """
    k = len(aggregators)
    m = np.concatenate(
        [
            oracle_mma_aggregator(a, h, add_all, mask_ws[ki], activation)
            for ki, a in enumerate(aggregators)
        ],
        axis=0,
    )  # (K·N, F)
    m = np.concatenate([m, m, m], axis=1)  # N3: 3 identity scaler copies
    weight = np.concatenate([w, w, w], axis=0)  # (3F, C)
    support = m @ weight  # (K·N, C)
    adj_k = np.concatenate([adj] * k, axis=1)  # (N, K·N)
    return adj_k @ support + b


def oracle_node_classifier(x, adj, add_all, params, aggregators,
                           activation="new_sigmoid"):
    """models.py:64-68 deterministic forward → log-softmax output."""
    h = oracle_gcn(x, adj, params["gc1_w"], params["gc1_b"])
    h = np.maximum(h, 0.0)
    out = oracle_mma_forward(
        h, adj, add_all, params["masks"], params["mma_w"], params["mma_b"],
        aggregators, activation,
    )
    out = out - out.max(axis=1, keepdims=True)
    return out - np.log(np.exp(out).sum(axis=1, keepdims=True))


# ---------------------------------------------------------------------------
# Graph regression (mma_conv.py / mask_aggr.py) oracle
# ---------------------------------------------------------------------------


def oracle_zinc_conv(
    x, edge_src, edge_dst, edge_attr_enc, conv_params, aggregators, scalers,
    avg_deg, towers, parity=True,
):
    """MMAConv.forward (mma_conv.py:121-196), deterministic.

    ``x``: (N, F); ``edge_attr_enc``: (E, F) already edge-encoded.
    ``conv_params``: dict with per-aggregator per-tower pre-NN (w, b),
    per-tower post-NN (w, b), and lin (w, b) — numpy arrays.
    parity=True: N6 (last aggregator's messages for all reduces) and N9
    (compounding scalers).
    """
    n, f = x.shape
    e = len(edge_src)
    x_t = np.broadcast_to(x[:, None, :], (n, towers, f))

    # message (mma_conv.py:138-157): h = [x_i ‖ x_j ‖ e] per tower, pre-NN.
    def messages(agg_idx):
        msgs = np.zeros((e, towers, f), x.dtype)
        h_cat = np.concatenate(
            [
                x[edge_dst][:, None, :].repeat(towers, 1),
                x[edge_src][:, None, :].repeat(towers, 1),
                edge_attr_enc[:, None, :].repeat(towers, 1),
            ],
            axis=-1,
        )  # (E, T, 3F)
        for t in range(towers):
            w, b = conv_params["pre"][agg_idx][t]
            msgs[:, t, :] = h_cat[:, t, :] @ w + b
        return msgs

    if parity:
        msgs_per_agg = [messages(len(aggregators) - 1)] * len(aggregators)
    else:
        msgs_per_agg = [messages(ki) for ki in range(len(aggregators))]

    deg = np.bincount(edge_dst, minlength=n).astype(x.dtype)
    deg_c = np.maximum(deg, 1.0)[:, None, None]

    # aggregate (mma_conv.py:159-176)
    outs = []
    for ki, a in enumerate(aggregators):
        msgs = msgs_per_agg[ki]
        red = np.zeros((n, towers, f), x.dtype)
        if a in ("sum", "mean"):
            for idx in range(e):
                red[edge_dst[idx]] += msgs[idx]
            if a == "mean":
                red = red / deg_c
        elif a in ("max", "min"):
            fill = -np.inf if a == "max" else np.inf
            red[:] = fill
            op = np.maximum if a == "max" else np.minimum
            for idx in range(e):
                red[edge_dst[idx]] = op(red[edge_dst[idx]], msgs[idx])
            red[deg == 0] = 0.0  # torch_scatter empty-segment fill
        elif a in ("var", "std"):
            s = np.zeros((n, towers, f), x.dtype)
            s2 = np.zeros((n, towers, f), x.dtype)
            for idx in range(e):
                s[edge_dst[idx]] += msgs[idx]
                s2[edge_dst[idx]] += msgs[idx] ** 2
            red = s2 / deg_c - (s / deg_c) ** 2
            if a == "std":
                red = np.sqrt(np.maximum(red, 0) + 1e-5)
        else:
            raise ValueError(a)
        outs.append(red)
    agg = np.concatenate(outs, axis=-1)  # (N, T, K·F)

    # scalers (mma_conv.py:178-196); parity compounds (N9).
    souts = []
    cur = agg
    for s in scalers:
        if s == "identity":
            fac = None
        elif s == "amplification":
            fac = np.log(deg_c + 1) / avg_deg["log"]
        elif s == "attenuation":
            fac = avg_deg["log"] / np.log(deg_c + 1)
        elif s == "linear":
            fac = deg_c / avg_deg["lin"]
        elif s == "inverse_linear":
            fac = avg_deg["lin"] / deg_c
        else:
            raise ValueError(s)
        if parity:
            if fac is not None:
                cur = cur * fac
            souts.append(cur)
        else:
            souts.append(agg if fac is None else agg * fac)
    scaled = np.concatenate(souts, axis=-1)  # (N, T, S·K·F)

    out = np.concatenate([x_t, scaled], axis=-1)
    tower_outs = []
    for t in range(towers):
        w, b = conv_params["post"][t]
        tower_outs.append(out[:, t, :] @ w + b)
    out = np.concatenate(tower_outs, axis=1)
    w, b = conv_params["lin"]
    return out @ w + b
