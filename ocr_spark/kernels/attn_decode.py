"""R8: encoder-decoder attention decode (the reference's CRNNWithAttn
inference path), re-derived in numpy with fixture weights.

Semantics parity (behavior only; /root/reference/architectures/crnn_arch.py):
- additive attention: energies = score(tanh(i2h(memory) + h2h(h_prev)))
  (AttentionCell.call, crnn_arch.py:267-298);
- context = softmax(energies)^T @ memory; LSTM input = [context, embedding]
  (crnn_arch.py:289-298); logits = Dense(h) (the 'generator');
- WINDOWED monotonic attention: per step the attention is masked to
  [center - offset, center + win_len - offset] with center =
  clip(main_attention, offset, T - win_len + offset)
  (CRNNWithAttn.step, crnn_arch.py:680-698);
- main_attention = max(argmax(attn), prev_main + 1) — strictly advancing
  read head (crnn_arch.py:705-707);
- once main_attention >= encoder length, the logits are replaced by a
  forced EOS (crnn_arch.py:711-720);
- embeddings are one-hot (one_hot_initializer, crnn_arch.py:588-589).

No model weights ship with the reference either (downloaded at run time);
as with the CTC fixtures (FIXTURES.md §3) the weights here are seeded
deterministic tensors — tests pin the decode MECHANISM (windowing,
monotonicity, forced termination, batch==loop equality), not glyphs.
"""

from __future__ import annotations

import numpy as np


class AttnWeights:
    """Seeded fixture weights for the attention decoder stack."""

    def __init__(self, vocab: int, memory_dim: int, hidden: int, seed: int = 42):
        rng = np.random.RandomState(seed)

        def glorot(*shape):
            limit = np.sqrt(6.0 / (shape[0] + shape[-1]))
            return rng.uniform(-limit, limit, size=shape)

        self.vocab, self.memory_dim, self.hidden = vocab, memory_dim, hidden
        self.i2h = glorot(memory_dim, hidden)              # no bias
        self.h2h = glorot(hidden, hidden)
        self.h2h_b = np.zeros(hidden)
        self.score = glorot(hidden, 1)                     # no bias
        in_dim = memory_dim + vocab                        # [context, one-hot]
        self.lstm_w = glorot(in_dim, 4 * hidden)
        self.lstm_u = glorot(hidden, 4 * hidden)
        self.lstm_b = np.zeros(4 * hidden)
        self.lstm_b[hidden : 2 * hidden] = 1.0             # unit forget bias
        self.out_w = glorot(hidden, vocab)
        self.out_b = np.zeros(vocab)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_step(x, h, c, w: AttnWeights):
    z = x @ w.lstm_w + h @ w.lstm_u + w.lstm_b
    hid = w.hidden
    i = _sigmoid(z[:, :hid])
    f = _sigmoid(z[:, hid : 2 * hid])
    g = np.tanh(z[:, 2 * hid : 3 * hid])
    o = _sigmoid(z[:, 3 * hid :])
    c_new = f * c + i * g
    h_new = o * np.tanh(c_new)
    return h_new, c_new


def attn_greedy_decode_batch(
    memory: np.ndarray,
    mem_lengths,
    weights: AttnWeights,
    *,
    sos: int,
    eos: int,
    max_length: int = 64,
    attn_mask_offset: int = 5,
    attn_mask_win_len: int = 16,
):
    """Batched greedy attention decode over padded (N, T, D) memories.

    Returns (tokens: list[list[int]] WITHOUT sos/eos, n_steps: (N,) int64,
    attn_trace: list of (steps_i, T) attention matrices).
    """
    memory = np.asarray(memory, dtype=np.float64)
    n, t, d = memory.shape
    mem_lengths = np.asarray(mem_lengths, dtype=np.int64)
    mem_proj = memory @ weights.i2h  # (N, T, H), computed once per call

    h = np.zeros((n, weights.hidden))
    c = np.zeros((n, weights.hidden))
    main_att = np.zeros(n, dtype=np.int64)
    prev = np.full(n, sos, dtype=np.int64)
    finished = np.zeros(n, dtype=bool)
    tokens = [[] for _ in range(n)]
    attn_trace = [[] for _ in range(n)]
    pos = np.arange(t)[None, :]
    pad_mask = pos < mem_lengths[:, None]  # padded frames never attended

    steps = np.zeros(n, dtype=np.int64)
    for _ in range(max_length):
        # compute only the ACTIVE rows: a straggler sequence must not keep
        # re-running the (N, T, H) attention for 63 finished neighbors
        act = np.flatnonzero(~finished)
        if len(act) == 0:
            break
        a_mem = memory[act]
        a_proj = mem_proj[act]
        a_len = mem_lengths[act]
        a_main = main_att[act]
        a_pos = pos[:, : memory.shape[1]]

        # windowed monotonic mask (crnn_arch.py:680-698)
        center = np.maximum(attn_mask_offset, a_main)
        center = np.minimum(center, a_len - attn_mask_win_len + attn_mask_offset)
        center = center[:, None]
        win = (center - attn_mask_offset <= a_pos) & (
            a_pos <= center + attn_mask_win_len - attn_mask_offset
        )
        mask = win & pad_mask[act]

        state_proj = h[act] @ weights.h2h + weights.h2h_b
        energies = np.tanh(a_proj + state_proj[:, None, :]) @ weights.score
        energies = energies[:, :, 0]
        energies = np.where(mask, energies, -np.inf)
        # guard: a fully-masked row (tiny memory) attends its first frame
        dead = ~mask.any(axis=1)
        if dead.any():
            energies[dead, 0] = 0.0
        e = energies - energies.max(axis=1, keepdims=True)
        attn = np.exp(e)
        attn /= attn.sum(axis=1, keepdims=True)

        context = (attn[:, :, None] * a_mem).sum(axis=1)
        one_hot = np.zeros((len(act), weights.vocab))
        one_hot[np.arange(len(act)), prev[act]] = 1.0
        h_new, c_new = _lstm_step(
            np.concatenate([context, one_hot], axis=1), h[act], c[act], weights
        )
        h[act] = h_new
        c[act] = c_new
        logits = h_new @ weights.out_w + weights.out_b

        # the read head advances FIRST, then forces EOS once it passes the
        # memory (reference order: crnn_arch.py:705-720, using per-sequence
        # true lengths where the batch=1 reference uses the padded T)
        new_main = np.maximum(attn.argmax(axis=1), a_main + 1)
        main_att[act] = new_main
        past_end = new_main >= a_len
        nxt = np.where(past_end, eos, logits.argmax(axis=1))

        for k, i in enumerate(act):
            attn_trace[i].append(attn[k])
            steps[i] += 1
            if nxt[k] == eos:
                finished[i] = True
            else:
                tokens[i].append(int(nxt[k]))
                prev[i] = nxt[k]

    return tokens, steps, [np.array(a) for a in attn_trace]


def synth_memory_for_text(
    text: str, vocab_index: dict, *, memory_dim: int, seed: int = 7
) -> np.ndarray:
    """Deterministic fixture encoder output: one frame per char, one-hot
    body + seeded positional noise (the FIXTURES.md §3 pattern)."""
    rng = np.random.RandomState(seed)
    t = max(len(text), 1)
    mem = rng.standard_normal((t, memory_dim)) * 0.05
    for i, ch in enumerate(text):
        idx = vocab_index.get(ch)
        if idx is not None and idx < memory_dim:
            mem[i, idx] += 1.0
    return mem
