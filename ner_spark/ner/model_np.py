"""Pure-numpy BiLSTM-CRF *inference* core (reference compute C2–C7,
SURVEY.md §2.1; architecture per Huang/Xu/Yu 2015 arXiv:1508.01991 and
Lample et al. NAACL 2016 — public literature, no reference code).

Deterministic fp32: sequential time loop, single-threaded BLAS
(workers pin OMP_NUM_THREADS=1 via the session factory), fixed
parameter dict — identical results on any executor/partitioning.

Parameter dict layout (``model_tiny.npz`` keys):
    embed   [V, d]        char embeddings (row 0 = <PAD>, 1 = <UNK>)
    wx_f, wh_f, b_f       forward  LSTM: [d,4h], [h,4h], [4h]
    wx_b, wh_b, b_b       backward LSTM
    proj_w  [2h, K]       emission projection
    proj_b  [K]
    trans   [K+2, K+2]    CRF transitions; rows/cols K=START, K+1=STOP
    vocab   array of chars (index = id)
"""

from __future__ import annotations

import numpy as np

from ner_spark.ner.decode import BIO_TAGS

K = len(BIO_TAGS)
START, STOP = K, K + 1
PAD_ID, UNK_ID = 0, 1
NEG_INF = -1e9


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def build_vocab(corpus_chars) -> dict[str, int]:
    """char → id; 0/1 reserved.  Sorted for determinism."""
    vocab = {"<PAD>": PAD_ID, "<UNK>": UNK_ID}
    for ch in sorted(set(corpus_chars)):
        vocab.setdefault(ch, len(vocab))
    return vocab


def encode_batch(
    char_seqs: list[list[str]], vocab: dict[str, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Pad to batch max-len → (ids [B,T] int32, lengths [B] int32)."""
    B = len(char_seqs)
    lengths = np.array([len(s) for s in char_seqs], dtype=np.int32)
    T = max(1, int(lengths.max()) if B else 1)
    ids = np.zeros((B, T), dtype=np.int32)
    for i, seq in enumerate(char_seqs):
        for j, ch in enumerate(seq):
            ids[i, j] = vocab.get(ch, UNK_ID)
    return ids, lengths


def _lstm_dir(x: np.ndarray, mask: np.ndarray, wx, wh, b, reverse: bool):
    """One LSTM direction over [B,T,d] → [B,T,h]; masked at padding."""
    B, T, _ = x.shape
    h_dim = wh.shape[0]
    h = np.zeros((B, h_dim), dtype=np.float32)
    c = np.zeros((B, h_dim), dtype=np.float32)
    out = np.zeros((B, T, h_dim), dtype=np.float32)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        g = x[:, t, :] @ wx + h @ wh + b  # [B, 4h]
        i_g = _sigmoid(g[:, :h_dim])
        f_g = _sigmoid(g[:, h_dim : 2 * h_dim])
        c_g = np.tanh(g[:, 2 * h_dim : 3 * h_dim])
        o_g = _sigmoid(g[:, 3 * h_dim :])
        m = mask[:, t : t + 1].astype(np.float32)
        c = m * (f_g * c + i_g * c_g) + (1 - m) * c
        h = m * (o_g * np.tanh(c)) + (1 - m) * h
        out[:, t, :] = h
    return out


def hidden_states(ids: np.ndarray, lengths: np.ndarray, p: dict) -> np.ndarray:
    """C3+C4: embedding lookup + BiLSTM concat → [B,T,2h] fp32."""
    mask = (
        np.arange(ids.shape[1])[None, :] < lengths[:, None]
    )  # [B,T] bool
    x = p["embed"][ids].astype(np.float32)  # [B,T,d]
    fwd = _lstm_dir(x, mask, p["wx_f"], p["wh_f"], p["b_f"], reverse=False)
    bwd = _lstm_dir(x, mask, p["wx_b"], p["wh_b"], p["b_b"], reverse=True)
    return np.concatenate([fwd, bwd], axis=-1)


def emissions(ids: np.ndarray, lengths: np.ndarray, p: dict) -> np.ndarray:
    """C5: [B,T,2h] @ proj → [B,T,K]."""
    h = hidden_states(ids, lengths, p)
    return h @ p["proj_w"] + p["proj_b"]


def viterbi_batch(
    emit: np.ndarray, lengths: np.ndarray, trans: np.ndarray
) -> list[list[int]]:
    """C7: batched Viterbi DP with START/STOP transitions.

    delta_t[k] = emit[t,k] + max_j(delta_{t-1}[j] + A[j,k]);
    vectorized over the batch: [B,K,1] + [K,K] broadcast per step.
    O(T·K²) per sentence; the reference's hot loop re-expressed in
    batch-major numpy (the template for the UDF inner loop)."""
    B, T, Kk = emit.shape
    A = trans[:K, :K]  # [K,K]
    delta = trans[START, :K][None, :] + emit[:, 0, :]  # [B,K]
    backp = np.zeros((B, T, Kk), dtype=np.int32)
    deltas = np.zeros((B, T, Kk), dtype=emit.dtype)
    deltas[:, 0, :] = delta
    for t in range(1, T):
        scores = delta[:, :, None] + A[None, :, :]  # [B, K_prev, K_cur]
        backp[:, t, :] = np.argmax(scores, axis=1)
        step = np.max(scores, axis=1) + emit[:, t, :]
        # frozen past end-of-sentence; real rows advance
        active = (np.arange(T)[t] < lengths)[:, None]
        delta = np.where(active, step, delta)
        deltas[:, t, :] = delta
    paths: list[list[int]] = []
    for b in range(B):
        L = int(lengths[b])
        if L == 0:
            paths.append([])
            continue
        final = deltas[b, L - 1, :] + trans[:K, STOP]
        k = int(np.argmax(final))
        rev = [k]
        for t in range(L - 1, 0, -1):
            k = int(backp[b, t, k])
            rev.append(k)
        paths.append(rev[::-1])
    return paths


def viterbi_brute(emit_1: np.ndarray, trans: np.ndarray) -> list[int]:
    """Exhaustive argmax over all K^T paths (tests only, T ≤ 6)."""
    import itertools

    T = emit_1.shape[0]
    best, best_score = None, -np.inf
    for path in itertools.product(range(K), repeat=T):
        s = trans[START, path[0]] + emit_1[0, path[0]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + emit_1[t, path[t]]
        s += trans[path[-1], STOP]
        if s > best_score:
            best, best_score = list(path), s
    return best


def tag_batch(
    char_seqs: list[list[str]], vocab: dict[str, int], p: dict
) -> list[list[str]]:
    """C2–C8 fused: char seqs → BIO tag strings."""
    if not char_seqs:
        return []
    nonempty = [s for s in char_seqs if s]
    if not nonempty:
        return [[] for _ in char_seqs]
    ids, lengths = encode_batch(char_seqs, vocab)
    emit = emissions(ids, lengths, p)
    paths = viterbi_batch(emit, lengths, p["trans"])
    return [[BIO_TAGS[k] for k in path] for path in paths]
