#!/usr/bin/env python3
"""Independent NumPy golden for the Bi-LSTM-CRF scoring stack.

Generates src/test/resources/bilstm_golden.json: seeded float32 weights
for the full published-best-model stack (word embedding lookup + charCNN
conv1d/'same' + max-pool + Bi-LSTM (TF v1 LSTMCell: gate order i,j,f,o,
forget_bias 1.0) + dense + CRF viterbi decode, tf.contrib.crf semantics)
plus a 10-sentence fixture, with expected per-token logits and decoded
tags computed by THIS file's from-scratch NumPy forward pass.

This is the offline half of the W11 trust chain: the Scala kernels
(graft.tag.BiLstm / CrfScorer) and this script are two independent
implementations of the same public TF v1 semantics — BiLstmGoldenSpec
asserts they agree to 1e-9 on logits and exactly on tags. No TF runs in
this image, so golden weights are seeded-random rather than trained;
parity evidence is identical either way (the kernels don't know where
the numbers came from).

Numeric contract mirrored from the Scala code (BiLstm.scala):
 - weights are float32; accumulation is float64;
 - float32 x float32 input-kernel products round to float32 BEFORE the
   float64 accumulate (Scala's `gates(g) += v * row(g)` with Float v,
   Float row); recurrent h-kernel products multiply in float64;
 - charCNN per-position conv outputs cast to float32 before the max;
 - char-LSTM word reprs cast final h to float32.

Run: python3 tools/gen_bilstm_golden.py   (deterministic, seed 20260816)
"""
import json
import numpy as np

SEED = 20260816
rng = np.random.default_rng(SEED)

WORD_DIM, CHAR_DIM, FILTERS, KSIZE, UNITS, TAGS = 5, 3, 4, 3, 6, 3
CL_UNITS = 4  # char-LSTM variant units


def f32(a):
    return np.asarray(a, dtype=np.float32)


def rand(*shape, scale=0.5):
    return f32(rng.uniform(-scale, scale, size=shape))


# ---------------- weights ----------------
words = ["alice", "bob", "works", "at", "acme", "corp", "in", "berlin",
         "the", "lab", "visited", "paris"]
word_vocab = {w: i for i, w in enumerate(words)}
word_emb = rand(len(words) + 1, WORD_DIM)
word_emb[-1] = 0.0  # OOV row = zeros, like the reference

chars = "abcdefghij"
char_vocab = {c: i for i, c in enumerate(chars)}
char_emb = rand(len(chars) + 1, CHAR_DIM)  # last row = OOV

cnn_kernel = rand(KSIZE, CHAR_DIM, FILTERS)
cnn_bias = rand(FILTERS)

IN = WORD_DIM + FILTERS
fw_kernel, fw_bias = rand(IN + UNITS, 4 * UNITS), rand(4 * UNITS, scale=0.1)
bw_kernel, bw_bias = rand(IN + UNITS, 4 * UNITS), rand(4 * UNITS, scale=0.1)
dense_w = rand(2 * UNITS, TAGS)
dense_b = rand(TAGS)
# doubles, like TF crf. Self-transitions penalized and off-diagonals
# asymmetric so the decoded path is steered by the PAIRWISE terms, not
# the per-token argmax (random unaries here all favor one tag — a
# random matrix decoded to constant paths, zero Viterbi coverage); the
# jitter keeps ties impossible and the margin assert below verifies it.
transition = (np.array([[-2.0, 1.4, -0.6],
                        [0.6, -2.0, 1.4],
                        [1.4, -0.6, -2.0]])
              + rng.uniform(-0.05, 0.05, size=(TAGS, TAGS)))

cl_fw_kernel = rand(CHAR_DIM + CL_UNITS, 4 * CL_UNITS)
cl_fw_bias = rand(4 * CL_UNITS, scale=0.1)
cl_bw_kernel = rand(CHAR_DIM + CL_UNITS, 4 * CL_UNITS)
cl_bw_bias = rand(4 * CL_UNITS, scale=0.1)

sentences = [
    ["alice", "works", "at", "acme", "corp"],
    ["bob", "visited", "berlin"],
    ["the", "lab", "in", "paris"],
    ["alice", "and", "bob"],          # "and" = OOV word
    ["zqx", "at", "acme"],            # OOV word AND OOV chars (z,q,x)
    ["a"],                            # single char, single token
    ["acme", "acme", "acme", "acme"],
    ["paris", "berlin", "paris", "berlin", "paris", "berlin"],
    ["the", "big", "corp", "lab"],    # "big" OOV word, in-vocab chars
    ["bob", "works", "in", "the", "lab", "at", "acme", "corp"],
]
cl_words = ["alice", "zqx", "a", "jjjj", "corp"]


# ---------------- independent forward pass ----------------
def char_cnn(word):
    """conv1d padding='same' + max-pool; per-position conv -> float32."""
    ids = [char_vocab.get(c, len(chars)) for c in word]
    n, half = len(word), (KSIZE - 1) // 2
    out = np.full(FILTERS, -np.inf, dtype=np.float32)
    for t in range(n):
        conv = cnn_bias.astype(np.float64).copy()
        for kk in range(KSIZE):
            src = t + kk - half
            if 0 <= src < n:
                # float32 products, float64 accumulate
                prod = (char_emb[ids[src]][:, None] * cnn_kernel[kk])
                conv += prod.astype(np.float32).astype(np.float64).sum(axis=0)
        out = np.maximum(out, conv.astype(np.float32))
    if n == 0:
        out = np.zeros(FILTERS, dtype=np.float32)
    return out


def lstm_run(kernel, bias, xs):
    """TF v1 LSTMCell over xs (float32 rows); returns h per step (f64)."""
    u = bias.shape[0] // 4
    insz = kernel.shape[0] - u
    c = np.zeros(u)
    h = np.zeros(u)
    hs = []
    for x in xs:
        gates = bias.astype(np.float64).copy()
        # input-kernel products round to float32 first (Scala Float*Float)
        xprod = (x[:, None] * kernel[:insz]).astype(np.float32)
        gates += xprod.astype(np.float64).sum(axis=0)
        gates += h @ kernel[insz:].astype(np.float64)
        i = 1.0 / (1.0 + np.exp(-gates[:u]))
        j = np.tanh(gates[u:2 * u])
        f = 1.0 / (1.0 + np.exp(-(gates[2 * u:3 * u] + 1.0)))  # forget_bias
        o = 1.0 / (1.0 + np.exp(-gates[3 * u:]))
        c = f * c + i * j
        h = o * np.tanh(c)
        hs.append(h.copy())
    return hs


def bi_run(fwk, fwb, bwk, bwb, xs):
    f = lstm_run(fwk, fwb, xs)
    b = lstm_run(bwk, bwb, xs[::-1])[::-1]
    return [np.concatenate([f[t], b[t]]) for t in range(len(xs))]


def logits_of(tokens):
    xs = []
    for t in tokens:
        e = word_emb[word_vocab.get(t, len(words))]
        xs.append(np.concatenate([e, char_cnn(t)]).astype(np.float32))
    hs = bi_run(fw_kernel, fw_bias, bw_kernel, bw_bias, xs)
    return [h @ dense_w.astype(np.float64) + dense_b.astype(np.float64)
            for h in hs]


def viterbi(logits):
    """tf.contrib.crf.crf_decode: first-max tie-breaking, strict >."""
    n = len(logits)
    delta = [logits[0]]
    ptr = []
    for i in range(1, n):
        s = delta[-1][:, None] + transition  # [prev][cur]
        best_prev = np.argmax(s, axis=0)     # first max, like strict >
        delta.append(s[best_prev, range(TAGS)] + logits[i])
        ptr.append(best_prev)
    tags = [int(np.argmax(delta[-1]))]
    for bp in reversed(ptr):
        tags.append(int(bp[tags[-1]]))
    return tags[::-1]


def char_lstm_repr(word):
    xs = [char_emb[char_vocab.get(c, len(chars))] for c in word]
    if not xs:
        return np.zeros(2 * CL_UNITS, dtype=np.float32)
    hf = lstm_run(cl_fw_kernel, cl_fw_bias, xs)[-1]
    hb = lstm_run(cl_bw_kernel, cl_bw_bias, xs[::-1])[-1]
    return np.concatenate([hf, hb]).astype(np.float32)


logits = [[list(map(float, l)) for l in logits_of(s)] for s in sentences]
tags = [viterbi(logits_of(s)) for s in sentences]
cl_reprs = [list(map(float, char_lstm_repr(w))) for w in cl_words]

# Margin sanity: decoded path must beat every other path by a real gap
# (protects tag-exactness against cross-platform 1-ulp libm drift).
from itertools import product
for si, s in enumerate(sentences):
    lg = logits_of(s)
    def score(path):
        v = sum(lg[i][path[i]] for i in range(len(path)))
        v += sum(transition[path[i - 1]][path[i]] for i in range(1, len(path)))
        return v
    best = score(tags[si])
    runner = max(score(p) for p in product(range(TAGS), repeat=len(s))
                 if list(p) != tags[si])
    assert best - runner > 1e-6, (si, best - runner)

golden = {
    "seed": SEED,
    "word_vocab": word_vocab,
    "word_emb": word_emb.tolist(),
    "char_vocab": {c: i for c, i in char_vocab.items()},
    "char_emb": char_emb.tolist(),
    "cnn_kernel": cnn_kernel.tolist(),
    "cnn_bias": cnn_bias.tolist(),
    "fw_kernel": fw_kernel.tolist(), "fw_bias": fw_bias.tolist(),
    "bw_kernel": bw_kernel.tolist(), "bw_bias": bw_bias.tolist(),
    "dense": dense_w.tolist(), "dense_bias": dense_b.tolist(),
    "transition": transition.tolist(),
    "sentences": sentences,
    "logits": logits,
    "tags": tags,
    "cl_fw_kernel": cl_fw_kernel.tolist(), "cl_fw_bias": cl_fw_bias.tolist(),
    "cl_bw_kernel": cl_bw_kernel.tolist(), "cl_bw_bias": cl_bw_bias.tolist(),
    "cl_words": cl_words,
    "cl_reprs": cl_reprs,
}
out = "src/test/resources/bilstm_golden.json"
with open(out, "w") as f:
    json.dump(golden, f)
print(f"wrote {out}: {len(sentences)} sentences, "
      f"{sum(len(s) for s in sentences)} tokens, {len(cl_words)} cl words")
