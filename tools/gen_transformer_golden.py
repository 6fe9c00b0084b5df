#!/usr/bin/env python3
"""Independent NumPy golden for the transformer-branch kernels.

Generates src/test/resources/transformer_golden.json: seeded float64
weights and input sequences plus expected outputs of the four public
TF-1.x formulas this engine re-implements in graft.tag.Transformer —
sinusoidal positional encodings (live `pos_embeddings` variant with
elementwise zero-masking), layer norm (epsilon inside the root),
masked scaled-dot-product attention (key mask -> causal mask ->
softmax -> query mask), and the self-projecting multi-head wrapper
(one dense projection serves as Q=K=V, residual add of the raw
queries, layer norm last) — computed by THIS file's from-scratch NumPy
pass. TransformerGoldenSpec asserts the Scala kernels agree to 1e-9.

The reference repo's own transformer branch is dead code (its model
driver calls an undefined method), so there is no trained end-to-end
output to pin; two independent implementations of the same public
formulas agreeing elementwise is the strongest parity evidence
available, exactly like the Bi-LSTM golden.

Run: python3 tools/gen_transformer_golden.py  (deterministic, seed 20260817)
"""
import json
import numpy as np

SEED = 20260817
rng = np.random.default_rng(SEED)

E = 8          # d_model
HEADS = 2
MAXLEN = 2000
PAD = -2**32 + 1


def pos_enc_table(maxlen, e):
    pe = np.array([[pos / np.power(10000.0, (i - i % 2) / e)
                    for i in range(e)] for pos in range(maxlen)])
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe


def pos_embeddings(x, maxlen, masking=True):
    t, e = x.shape
    out = pos_enc_table(maxlen, e)[:t].copy()
    if masking:
        out = np.where(x == 0.0, 0.0, out)
    return out


def layer_norm(x, gamma, beta, eps=1e-8):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return gamma * ((x - mean) / (var + eps) ** 0.5) + beta


def sdpa(q, k, v, causality=False):
    dk = q.shape[-1]
    scores = q @ k.T / np.sqrt(dk)
    scores[:, np.abs(k).sum(-1) == 0] = PAD       # key mask
    if causality:                                  # future mask
        scores[np.triu(np.ones_like(scores), 1) > 0] = PAD
    m = scores.max(-1, keepdims=True)
    e = np.exp(scores - m)
    alphas = e / e.sum(-1, keepdims=True)
    alphas = alphas * (np.abs(q).sum(-1) != 0)[:, None]  # query mask
    return alphas @ v


def mha(queries, w, b, num_heads, gamma, beta, causality=False):
    proj = queries @ w + b                         # Q = K = V
    heads = np.split(proj, num_heads, axis=-1)
    ctx = np.concatenate([sdpa(h, h, h, causality) for h in heads], axis=-1)
    return layer_norm(ctx + queries, gamma, beta)


# ---------------- fixtures ----------------
def seq(t):
    return rng.uniform(-1.5, 1.5, size=(t, E))


xa = seq(7)
xa[3, :] = 0.0          # full-zero row: key AND query masking fire
xa[1, 2] = 0.0          # lone zero element: PE elementwise mask fires
xb = seq(1)
xc = seq(10)
sequences = [xa, xb, xc]

# dense weights round-trip through float32: the Scala side stores them
# as Float (Attention.Dense) and widens to double per product, so both
# implementations must start from the same float32-representable values
w = rng.uniform(-0.7, 0.7, size=(E, E)).astype(np.float32).astype(np.float64)
b = rng.uniform(-0.2, 0.2, size=E).astype(np.float32).astype(np.float64)
gamma = rng.uniform(0.5, 1.5, size=E)
beta = rng.uniform(-0.3, 0.3, size=E)

out = {
    "dense_w": w.tolist(),
    "dense_b": b.tolist(),
    "gamma": gamma.tolist(),
    "beta": beta.tolist(),
    "sequences": [x.tolist() for x in sequences],
    "pos_table_head": pos_enc_table(12, E).tolist(),
    "pos_embeddings": [pos_embeddings(x, MAXLEN, True).tolist()
                       for x in sequences],
    "pos_embeddings_unmasked": [pos_embeddings(x, MAXLEN, False).tolist()
                                for x in sequences],
    "layer_norm": [layer_norm(x, gamma, beta).tolist() for x in sequences],
    "sdpa": [sdpa(x, x, x, False).tolist() for x in sequences],
    "sdpa_causal": [sdpa(x, x, x, True).tolist() for x in sequences],
    # cross-sequence q/k/v: rectangular score matrix, narrower v dim
    "sdpa_cross": sdpa(xa, xc, xc[:, :5]).tolist(),
    "mha": [mha(x, w, b, HEADS, gamma, beta, False).tolist()
            for x in sequences],
    "mha_causal": [mha(x, w, b, HEADS, gamma, beta, True).tolist()
                   for x in sequences],
}

with open("src/test/resources/transformer_golden.json", "w") as f:
    json.dump(out, f)
print("wrote src/test/resources/transformer_golden.json")
