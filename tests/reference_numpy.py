"""Pure-numpy oracle of the reference SGFormer math.

Implements the equations documented in SURVEY.md §2.1 (rows 1-7), i.e. the
behavior of ``/root/reference/{medium,large,100M}/ours.py``, as plain numpy
for parity-testing the JAX implementation with pinned weights.  This is an
independent re-derivation from the math spec, not a copy of reference code.
"""

import numpy as np


def full_attention_conv(qs, ks, vs, output_attn=False):
    """qs [N,H,M], ks [L,H,M], vs [L,H,D] -> [N,H,D] (+ [N,L] map)."""
    qs = qs / np.linalg.norm(qs.ravel())
    ks = ks / np.linalg.norm(ks.ravel())
    n = qs.shape[0]
    kvs = np.einsum("lhm,lhd->hmd", ks, vs)
    num = np.einsum("nhm,hmd->nhd", qs, kvs) + n * vs
    ks_sum = ks.sum(axis=0)
    den = np.einsum("nhm,hm->nh", qs, ks_sum)[..., None] + n
    out = num / den
    if output_attn:
        attn = np.einsum("nhm,lhm->nlh", qs, ks).mean(axis=-1)
        attn = attn / den.squeeze(-1).mean(axis=-1, keepdims=True)
        return out, attn
    return out


def layer_norm(x, gamma, beta, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def relu(x):
    return np.maximum(x, 0.0)


def linear(x, w, b=None):
    """w is [in, out] (flax layout)."""
    y = x @ w
    return y + b if b is not None else y


def trans_conv_layer(x, params, num_heads, use_weight=True):
    """TransConvLayer forward (eval mode), params from the flax module."""
    n = x.shape[0]
    qs = linear(x, params["Wq"]["kernel"], params["Wq"]["bias"]).reshape(
        n, num_heads, -1
    )
    ks = linear(x, params["Wk"]["kernel"], params["Wk"]["bias"]).reshape(
        n, num_heads, -1
    )
    if use_weight:
        vs = linear(x, params["Wv"]["kernel"], params["Wv"]["bias"]).reshape(
            n, num_heads, -1
        )
    else:
        vs = x.reshape(n, 1, -1)
    return full_attention_conv(qs, ks, vs).mean(axis=1)


def trans_conv(
    x,
    params,
    num_layers,
    num_heads,
    alpha=0.5,
    use_bn=True,
    use_residual=True,
    use_weight=True,
    use_act=False,
    residual_mode="alpha",
):
    """TransConv forward, eval mode (dropout off)."""
    x = linear(x, params["fc_in"]["kernel"], params["fc_in"]["bias"])
    if use_bn:
        x = layer_norm(x, params["ln_in"]["scale"], params["ln_in"]["bias"])
    x = relu(x)
    prev = x
    for i in range(num_layers):
        x = trans_conv_layer(x, params[f"conv_{i}"], num_heads, use_weight)
        if use_residual:
            if residual_mode == "alpha":
                x = alpha * x + (1 - alpha) * prev
            else:
                x = (x + prev) / 2.0
        if use_bn:
            x = layer_norm(x, params[f"ln_{i}"]["scale"], params[f"ln_{i}"]["bias"])
        if use_act:
            x = relu(x)
        prev = x
    return x


def gcn_adj_dense(src, dst, num_nodes):
    """Dense normalized adjacency of GraphConvLayer (large/ours.py:25-33):
    in-degree over dst, weight 1/sqrt(d[dst]d[src]), aggregate src->dst."""
    d = np.bincount(dst, minlength=num_nodes).astype(np.float64)
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(d)
    dinv[~np.isfinite(dinv)] = 0.0
    a = np.zeros((num_nodes, num_nodes))
    for s, t in zip(src, dst):
        a[t, s] += dinv[t] * dinv[s]
    return a


def batch_norm_train(x, gamma, beta, eps=1e-5):
    mu = x.mean(axis=0)
    var = x.var(axis=0)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def graph_conv(
    x,
    adj,
    params,
    num_layers,
    use_bn=True,
    use_residual=True,
    use_weight=True,
    use_init=False,
    use_act=True,
    train=True,
):
    """GraphConv forward (large/ours.py:74-94).  BatchNorm uses batch stats
    when train=True (torch semantics)."""
    x = linear(x, params["fc_in"]["kernel"], params["fc_in"]["bias"])
    if use_bn:
        bn = params["bn_in"]
        if train:
            x = batch_norm_train(x, bn["scale"], bn["bias"])
        else:
            x = (x - bn["mean"]) / np.sqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
    x = relu(x)
    x0 = x
    for i in range(num_layers):
        x = adj @ x
        if use_init:
            x = np.concatenate([x, x0], axis=1)
            x = linear(x, params[f"conv_{i}"]["W"]["kernel"], params[f"conv_{i}"]["W"]["bias"])
        elif use_weight:
            x = linear(x, params[f"conv_{i}"]["W"]["kernel"], params[f"conv_{i}"]["W"]["bias"])
        if use_bn:
            bn = params[f"bn_{i}"]
            if train:
                x = batch_norm_train(x, bn["scale"], bn["bias"])
            else:
                x = (x - bn["mean"]) / np.sqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
        if use_act:
            x = relu(x)
        if use_residual:
            x = x + x0
    return x


def random_graph(rng, num_nodes, num_edges):
    """Random directed edge list (may contain duplicates)."""
    src = rng.integers(0, num_nodes, num_edges)
    dst = rng.integers(0, num_nodes, num_edges)
    return np.stack([src, dst]).astype(np.int64)
