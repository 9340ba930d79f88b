"""CTC prefix beam search — static-shape JAX kernel.

TPU-native replacement for the reference's C++ beam decoder
(externals/ctc_decoders.zip: ctc_beam_search_decoder.cpp + path_trie.cpp +
KenLM scorer, SWIG-bound — see SURVEY.md §2.10). The C++ version keeps a
pointer-based prefix trie; on TPU the state must be flat and fixed-width:

- beams are [W, L] int32 prefix buffers + lengths, with log probabilities
  split into blank-ending ``p_b`` and non-blank-ending ``p_nb`` (the
  classic prefix beam search of Hannun et al. 2014);
- per frame, the vocabulary is pruned to the top-K tokens (``prune_k``),
  giving W stay-candidates + W*K extension-candidates;
- duplicate prefixes are merged by 64-bit rolling hash (two independent
   32-bit lanes): sort-by-hash -> segment logsumexp -> keep first
  occurrence -> top-W. No pointers, no dynamic shapes — one ``lax.scan``
  over time, ``vmap`` over the batch;
- optional shallow-fusion token-bigram LM: ``lm_logp[prev, c]`` added with
  weight ``lm_weight`` on every extension (the KenLM-scorer hook of the
  reference, reduced to a tensor so it lives on-chip).

Exactness: identical to reference prefix beam search up to (a) top-K frame
pruning (standard in the C++ decoder too: cutoff_top_n) and (b) the
astronomically unlikely 64-bit hash collision.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30
_P1 = jnp.uint32(2654435761)
_P2 = jnp.uint32(40503)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _segment_logsumexp(vals: jnp.ndarray, seg: jnp.ndarray, num: int
                       ) -> jnp.ndarray:
    """Per-segment logsumexp of ``vals`` grouped by ``seg`` ids."""
    m = jax.ops.segment_max(vals, seg, num_segments=num)
    m = jnp.where(m <= NEG_INF / 2, NEG_INF, m)
    shifted = jnp.exp(vals - jnp.maximum(m[seg], NEG_INF))
    s = jax.ops.segment_sum(shifted, seg, num_segments=num)
    out = m + jnp.log(jnp.maximum(s, 1e-37))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


class BeamState(NamedTuple):
    prefixes: jnp.ndarray     # [W, L] int32 (pad 0 beyond len)
    lengths: jnp.ndarray      # [W] int32
    last: jnp.ndarray         # [W] int32 last token (-1 for empty)
    ctx: jnp.ndarray          # [W, C] int32 last C tokens (BOS-padded),
    #                           the (order-1)-gram context for n-gram fusion
    h1: jnp.ndarray           # [W] uint32 rolling hash lane 1
    h2: jnp.ndarray           # [W] uint32 rolling hash lane 2
    p_b: jnp.ndarray          # [W] log p(prefix, ends in blank)
    p_nb: jnp.ndarray         # [W] log p(prefix, ends in non-blank)


def _init_state(beam_width: int, max_len: int, ctx_len: int = 1,
                bos: int = 0) -> BeamState:
    w, l = beam_width, max_len
    return BeamState(
        prefixes=jnp.zeros((w, l), jnp.int32),
        lengths=jnp.zeros((w,), jnp.int32),
        last=jnp.full((w,), -1, jnp.int32),
        ctx=jnp.full((w, ctx_len), bos, jnp.int32),
        h1=jnp.full((w,), jnp.uint32(17), jnp.uint32),
        h2=jnp.full((w,), jnp.uint32(29), jnp.uint32),
        p_b=jnp.where(jnp.arange(w) == 0, 0.0, NEG_INF),
        p_nb=jnp.full((w,), NEG_INF, jnp.float32),
    )


def _step(state: BeamState, logp_t: jnp.ndarray, blank_id: int,
          prune_k: int, max_len: int,
          lm_logp: Optional[jnp.ndarray], lm_weight: float,
          ngram_lm=None) -> BeamState:
    w, l = state.prefixes.shape
    ptot = _logaddexp(state.p_b, state.p_nb)                     # [W]

    top_lp, top_ids = jax.lax.top_k(logp_t, prune_k)             # [K]
    lp_blank = logp_t[blank_id]
    lp_last = jnp.where(state.last >= 0,
                        logp_t[jnp.maximum(state.last, 0)], NEG_INF)

    # ---- stay candidates (one per beam, same prefix) ----------------------
    stay_pb = ptot + lp_blank
    stay_pnb = state.p_nb + lp_last

    # ---- extension candidates [W, K] --------------------------------------
    ids = jnp.broadcast_to(top_ids[None, :], (w, prune_k))       # [W, K]
    is_blank = ids == blank_id
    same_as_last = ids == state.last[:, None]
    base = jnp.where(same_as_last, state.p_b[:, None], ptot[:, None])
    ext_pnb = base + top_lp[None, :]
    if ngram_lm is not None:
        from tensorflowasr_tpu.utils.ngram_lm import score_candidates
        ext_pnb = ext_pnb + score_candidates(ngram_lm, state.ctx,
                                             ids) * lm_weight
    elif lm_logp is not None:
        prev = jnp.maximum(state.last, 0)                        # 0 for empty
        lm = lm_logp[prev[:, None], ids] * lm_weight
        ext_pnb = ext_pnb + lm
    # blank "extension" is the stay-candidate's job; kill it here
    ext_pnb = jnp.where(is_blank, NEG_INF, ext_pnb)
    # dead beams can't extend
    ext_pnb = jnp.where(ptot[:, None] <= NEG_INF / 2, NEG_INF, ext_pnb)
    # saturated prefixes can't grow
    ext_pnb = jnp.where((state.lengths >= max_len)[:, None], NEG_INF,
                        ext_pnb)

    # candidate tensors: [W + W*K]
    n_cand = w + w * prune_k
    cand_pb = jnp.concatenate([stay_pb, jnp.full((w * prune_k,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    # prefix identity: hash of (possibly extended) prefix
    ext_h1 = (state.h1[:, None] * _P1 + ids.astype(jnp.uint32) +
              jnp.uint32(1))
    ext_h2 = (state.h2[:, None] * _P2 + ids.astype(jnp.uint32) +
              jnp.uint32(1))
    cand_h1 = jnp.concatenate([state.h1, ext_h1.reshape(-1)])
    cand_h2 = jnp.concatenate([state.h2, ext_h2.reshape(-1)])
    # source beam + extension token for reconstruction after top-k
    src = jnp.concatenate([
        jnp.arange(w, dtype=jnp.int32),
        jnp.repeat(jnp.arange(w, dtype=jnp.int32), prune_k)])
    ext_tok = jnp.concatenate([
        jnp.full((w,), -1, jnp.int32), ids.reshape(-1)])

    # ---- merge duplicates by hash (lexsort the two 32-bit lanes) ----------
    order = jnp.lexsort((cand_h2, cand_h1))
    h1_s, h2_s = cand_h1[order], cand_h2[order]
    pb_s, pnb_s = cand_pb[order], cand_pnb[order]
    diff = (h1_s[1:] != h1_s[:-1]) | (h2_s[1:] != h2_s[:-1])
    newseg = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              diff.astype(jnp.int32)])
    seg = jnp.cumsum(newseg) - 1                                  # [N]
    pb_m = _segment_logsumexp(pb_s, seg, n_cand)
    pnb_m = _segment_logsumexp(pnb_s, seg, n_cand)
    first = newseg == 1
    pb_u = jnp.where(first, pb_m[seg], NEG_INF)
    pnb_u = jnp.where(first, pnb_m[seg], NEG_INF)
    ptot_u = _logaddexp(pb_u, pnb_u)

    # ---- top-W beams -------------------------------------------------------
    top_p, top_pos = jax.lax.top_k(ptot_u, w)
    sel = order[top_pos]                                          # candidate id
    sel_src = src[sel]
    sel_tok = ext_tok[sel]
    sel_pb = pb_u[top_pos]
    sel_pnb = pnb_u[top_pos]

    # ---- rebuild beam arrays ----------------------------------------------
    base_pref = state.prefixes[sel_src]                           # [W, L]
    base_len = state.lengths[sel_src]
    extend = sel_tok >= 0
    pos = jnp.minimum(base_len, l - 1)
    onehot = (jnp.arange(l)[None, :] == pos[:, None]) & extend[:, None]
    new_pref = jnp.where(onehot, sel_tok[:, None], base_pref)
    new_len = base_len + extend.astype(jnp.int32)
    new_last = jnp.where(extend, sel_tok, state.last[sel_src])
    base_ctx = state.ctx[sel_src]                                 # [W, C]
    shifted = jnp.concatenate([base_ctx[:, 1:], sel_tok[:, None]], axis=1)
    new_ctx = jnp.where(extend[:, None], shifted, base_ctx)
    new_h1 = jnp.where(extend,
                       state.h1[sel_src] * _P1 +
                       sel_tok.astype(jnp.uint32) + jnp.uint32(1),
                       state.h1[sel_src])
    new_h2 = jnp.where(extend,
                       state.h2[sel_src] * _P2 +
                       sel_tok.astype(jnp.uint32) + jnp.uint32(1),
                       state.h2[sel_src])
    return BeamState(new_pref, new_len, new_last, new_ctx, new_h1, new_h2,
                     sel_pb, sel_pnb)


@functools.partial(jax.jit, static_argnames=(
    "blank_id", "beam_width", "prune_k", "max_len", "lm_weight"))
def ctc_beam_search_decode(
        logits: jnp.ndarray,
        lengths: jnp.ndarray,
        blank_id: int,
        beam_width: int = 8,
        prune_k: int = 8,
        max_len: int = 0,
        lm_logp: Optional[jnp.ndarray] = None,
        lm_weight: float = 0.3,
        ngram_lm=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched CTC prefix beam search.

    Args:
      logits: [B, T, V] raw logits (log-softmaxed internally).
      lengths: [B] valid frames.
      blank_id: CTC blank index.
      beam_width: number of beams kept (static).
      prune_k: per-frame vocabulary pruning (static).
      max_len: prefix capacity; 0 -> T.
      lm_logp: optional [V, V] token-bigram log probs for shallow fusion.
      lm_weight: LM interpolation weight.
      ngram_lm: optional ``utils.ngram_lm.DeviceNGramLM`` (from
        ``lm_pack``) — order-2..4 Kneser-Ney backoff LM scored on-chip;
        takes precedence over ``lm_logp`` (the KenLM-scorer role of the
        reference's externals/ctc_decoders).

    Returns:
      (prefixes [B, W, max_len] int32, lengths [B, W] int32,
       scores [B, W] total log prob), beams sorted best-first.
    """
    b, t, v = logits.shape
    if max_len <= 0:
        max_len = t
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ctx_len = max(ngram_lm.order - 1, 1) if ngram_lm is not None else 1
    bos = ngram_lm.bos if ngram_lm is not None else 0

    def one(logp_b, len_b):
        init = _init_state(beam_width, max_len, ctx_len, bos)

        def scan_fn(state, inp):
            lp_t, t_idx = inp
            new = _step(state, lp_t, blank_id, prune_k, max_len,
                        lm_logp, lm_weight, ngram_lm)
            live = t_idx < len_b
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    jnp.reshape(live, (1,) * n.ndim), n, o), new, state)
            return state, None

        final, _ = jax.lax.scan(scan_fn, init, (logp_b, jnp.arange(t)))
        score = _logaddexp(final.p_b, final.p_nb)
        order = jnp.argsort(-score)
        return (final.prefixes[order], final.lengths[order], score[order])

    return jax.vmap(one)(logp, lengths)
