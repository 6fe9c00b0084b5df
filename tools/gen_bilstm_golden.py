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

# ---------------- attention stack (models/attention.py:100-187,
# models/html_embeddings.py:47-72) ----------------
# Independent NumPy mirror of graft.tag.Attention: multiHead (Q/K/V
# dense projections, feature-axis head split, scale sqrt(headDim),
# softmax over keys, NO residual — the reference comments those lines
# out), exactAttention (equality scores, softmax, dense(values)
# weighted sum PLUS the live residual add of the raw values), and
# htmlRepr (two ancestor-tag embeddings flattened ++ float32 mean char
# embedding of the css class). Queries/keys are built the way the
# engine builds them: charLstmRepr(word) ++ htmlRepr (the html part
# constant per document), so duplicate words yield exactly-equal
# vectors and the equality scores fire across implementations.

HTML_DIM = 2
html_vocab = {"div": 0, "body": 1}
html_emb = rand(len(html_vocab) + 1, HTML_DIM)
html_emb[-1] = 0.0  # OOV row


def html_repr(ctx, css):
    dot = ctx.find(".")
    p1, p2 = (ctx, "") if dot < 0 else (ctx[:dot], ctx[dot + 1:])
    e1 = html_emb[html_vocab.get(p1, len(html_vocab))]
    e2 = html_emb[html_vocab.get(p2, len(html_vocab))]
    cd = char_emb.shape[1]
    acc = np.zeros(cd, dtype=np.float32)
    if css:
        for ch in css:  # sequential float32 adds, like the Scala loop
            acc = (acc + char_emb[char_vocab.get(ch, len(chars))]
                   ).astype(np.float32)
        acc = (acc / np.float32(len(css))).astype(np.float32)
    return np.concatenate([e1, e2, acc]).astype(np.float32)


def dense_apply(w, b, x):
    """tf.layers.dense on float64 activations with float32 weights."""
    return x @ w.astype(np.float64) + b.astype(np.float64)


def softmax(x):
    e = np.exp(x - np.max(x))
    return e / e.sum()


def exact_attention(queries, keys, values, wv_w, wv_b):
    v = [dense_apply(wv_w, wv_b, x) for x in values]
    out = []
    for qi, qv in enumerate(queries):
        scores = softmax(np.array(
            [1.0 if np.array_equal(qv, kv) else 0.0 for kv in keys]))
        o = values[qi].copy()
        for tj, a in enumerate(scores):
            o = o + a * v[tj]
        out.append(o)
    return out


def multi_head(queries, keys, values, wq_w, wq_b, wk, wv_w, wv_b, heads):
    q = [dense_apply(wq_w, wq_b, x) for x in queries]
    if wk is None:
        k = [dense_apply(wq_w, wq_b, x) for x in keys]
    else:
        k = [dense_apply(wk[0], wk[1], x) for x in keys]
    v = [dense_apply(wv_w, wv_b, x) for x in values]
    a_dim, v_dim = wq_b.shape[0], wv_b.shape[0]
    dq, dv = a_dim // heads, v_dim // heads
    out = [np.zeros(v_dim) for _ in queries]
    for h in range(heads):
        qo, vo = h * dq, h * dv
        for ti in range(len(queries)):
            scores = softmax(np.array(
                [np.dot(q[ti][qo:qo + dq], k[tj][qo:qo + dq])
                 / np.sqrt(float(dq)) for tj in range(len(keys))]))
            for tj, a in enumerate(scores):
                out[ti][vo:vo + dv] += a * v[tj][vo:vo + dv]
    return out


att_sequences = [
    ["alice", "bob", "alice"],
    ["corp", "corp", "corp", "lab"],
    ["a", "zqx", "a", "zqx", "jjjj"],
]
ATT_CTX, ATT_CSS = "div.body", "doc"
att_html = html_repr(ATT_CTX, ATT_CSS).astype(np.float64)

VD = 3  # raw value dim for exact attention
ea_wv_w, ea_wv_b = rand(VD, VD), rand(VD, scale=0.1)
# multiHead over the exact-attention outputs, like html_attention chains
mh_wq_w, mh_wq_b = rand(VD, 4), rand(4, scale=0.1)
mh_wk_w, mh_wk_b = rand(VD, 4), rand(4, scale=0.1)
mh_wv_w, mh_wv_b = rand(VD, 4), rand(4, scale=0.1)
MH_HEADS = 2

att_values = [[list(map(float, rng.uniform(-1, 1, size=VD)))
               for _ in s] for s in att_sequences]
att_ea_out, att_mh_out, att_mh2_out = [], [], []
for si, s in enumerate(att_sequences):
    qk = [np.concatenate([char_lstm_repr(w).astype(np.float64), att_html])
          for w in s]
    vals = [np.array(v) for v in att_values[si]]
    ea = exact_attention(qk, qk, vals, ea_wv_w, ea_wv_b)
    mh = multi_head(ea, ea, ea, mh_wq_w, mh_wq_b, None,
                    mh_wv_w, mh_wv_b, MH_HEADS)   # queries_eq_keys
    mh2 = multi_head(ea, ea, ea, mh_wq_w, mh_wq_b,
                     (mh_wk_w, mh_wk_b), mh_wv_w, mh_wv_b, MH_HEADS)
    att_ea_out.append([list(map(float, o)) for o in ea])
    att_mh_out.append([list(map(float, o)) for o in mh])
    att_mh2_out.append([list(map(float, o)) for o in mh2])

# equality really fires (duplicate words) and really discriminates
assert np.array_equal(
    np.concatenate([char_lstm_repr("alice").astype(np.float64), att_html]),
    np.concatenate([char_lstm_repr("alice").astype(np.float64), att_html]))
assert not np.array_equal(char_lstm_repr("alice"), char_lstm_repr("bob"))

html_cases = [["div.body", "doc"], ["span.td", "z"], ["body", ""],
              ["div.body", ""]]
html_reprs = [list(map(float, html_repr(c, s))) for c, s in html_cases]

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
    "html_vocab": html_vocab,
    "html_emb": html_emb.tolist(),
    "html_cases": html_cases,
    "html_reprs": html_reprs,
    "att_sequences": att_sequences,
    "att_ctx": ATT_CTX, "att_css": ATT_CSS,
    "att_values": att_values,
    "ea_wv_w": ea_wv_w.tolist(), "ea_wv_b": ea_wv_b.tolist(),
    "mh_wq_w": mh_wq_w.tolist(), "mh_wq_b": mh_wq_b.tolist(),
    "mh_wk_w": mh_wk_w.tolist(), "mh_wk_b": mh_wk_b.tolist(),
    "mh_wv_w": mh_wv_w.tolist(), "mh_wv_b": mh_wv_b.tolist(),
    "mh_heads": MH_HEADS,
    "att_ea_out": att_ea_out,
    "att_mh_out": att_mh_out,
    "att_mh2_out": att_mh2_out,
}
out = "src/test/resources/bilstm_golden.json"
with open(out, "w") as f:
    json.dump(golden, f)
print(f"wrote {out}: {len(sentences)} sentences, "
      f"{sum(len(s) for s in sentences)} tokens, {len(cl_words)} cl words")
