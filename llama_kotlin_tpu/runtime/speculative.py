"""Speculative decoding and prompt-lookup drafting.

Parity targets:
- examples/speculative/speculative.cpp (619 LoC): a draft model proposes
  n_draft tokens, the target verifies them in one batched decode, the
  longest agreeing prefix is accepted, and both caches are rolled back
  (seq_rm) past the first mismatch.  Greedy verification first (the
  reference's p_split tree drafts are a later extension).
- examples/lookup + common/ngram-cache.cpp: prompt-lookup decoding drafts
  from n-gram continuations already seen in the sequence, verified the
  same way — no draft model needed.

The verification step is a perfect fit for the unified cell cache: the
draft chunk is one flat ubatch with logits at every position.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from llama_kotlin_tpu.runtime.batch import Batch
from llama_kotlin_tpu.runtime.context import LlamaContext


@dataclass
class SpecStats:
    n_drafted: int = 0
    n_accepted: int = 0
    n_target_calls: int = 0

    @property
    def accept_rate(self) -> float:
        return self.n_accepted / self.n_drafted if self.n_drafted else 0.0


def _greedy(logits: np.ndarray) -> int:
    return int(np.argmax(logits))


def _draft_chain_device(draft: LlamaContext, last: int, n_past: int,
                        k: int) -> Optional[list[int]]:
    """Greedy K-step draft chain as ONE on-device generate_loop dispatch.

    The per-step host path costs a full dispatch round-trip per drafted
    token (~25-35 ms through the axon tunnel — it made device speculation
    slower than plain decode in the first round-5 measurement); this cuts
    a speculation round to two dispatches (draft chain + verify batch),
    the structure the reference gets for free from microsecond CUDA
    launches (examples/speculative/speculative.cpp).  Returns the K
    proposals (the draft cache is updated exactly like K single decodes),
    or None when the cache can't seat K cells (caller falls back)."""
    import jax.numpy as jnp

    from llama_kotlin_tpu.runtime.generate import SampleParams, generate_loop

    meta = draft.meta
    slots = meta.find_slots(k)
    if slots is None:
        return None
    pos = np.arange(n_past, n_past + k, dtype=np.int32)
    meta.commit(slots, pos, np.zeros(k, np.int32))
    span = meta.used_span()
    n_vis = next((b for b in getattr(draft, "_vis_buckets",
                                     (draft.n_cells,)) if b >= span),
                 draft.n_cells)
    out, cache, *_ = generate_loop(
        draft.params, draft.cfg, draft.cache, *meta.device_view(n_vis),
        jnp.full((1,), last, jnp.int32), jnp.full((1,), n_past, jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.asarray(slots.reshape(k, 1)),
        k, SampleParams(), draft.compute_dtype)
    draft.cache = cache
    return [int(t) for t in np.asarray(out)[:, 0]]


def speculative_generate(
    target: LlamaContext,
    draft: LlamaContext,
    prompt_tokens,
    n_predict: int,
    n_draft: int = 5,
    eos_id: int = -1,
    sample_fn: Optional[Callable[[np.ndarray], int]] = None,
) -> tuple[list[int], SpecStats]:
    """Greedy speculative decoding with a draft model.

    Returns (generated tokens, stats).  Output is identical to plain greedy
    decoding of the target (same argmax decisions).
    """
    sample = sample_fn or _greedy
    greedy = sample_fn is None  # device top-k path (no full-vocab fetch)
    prompt_tokens = np.asarray(prompt_tokens, np.int32)
    for c in (target, draft):
        c.clear()
        rc = c.decode(Batch.single(prompt_tokens))
        if rc != 0:
            raise RuntimeError("prefill failed")
    stats = SpecStats()
    out: list[int] = []
    last = (int(target.get_topk(1)[1][0, 0]) if greedy
            else sample(target.get_logits()[0]))
    stats.n_target_calls += 1
    out.append(last)
    n_past = len(prompt_tokens)  # same for target and draft

    while len(out) < n_predict and last != eos_id:
        # 1. draft proposes a chain greedily — one device dispatch when
        # greedy (K steps in-loop); per-step fallback otherwise
        proposals: list[int] = []
        if greedy:
            proposals = _draft_chain_device(draft, last, n_past,
                                            n_draft) or []
        if not proposals:
            d_tok = last
            for i in range(n_draft):
                rc = draft.decode(Batch(tokens=[d_tok], pos=[n_past + i],
                                        seq_id=[0], output=[True]))
                if rc != 0:
                    break
                d_tok = int(draft.get_topk(1)[1][0, 0])
                proposals.append(d_tok)
        if not proposals:
            # cache exhausted: fall back to plain decode of `last`
            rc = target.decode(Batch(tokens=[last], pos=[n_past], seq_id=[0],
                                     output=[True]))
            if rc != 0:
                break
            last = (int(target.get_topk(1)[1][0, 0]) if greedy
                    else sample(target.get_logits()[0]))
            stats.n_target_calls += 1
            out.append(last)
            n_past += 1
            continue

        # 2. target verifies the whole chain in one batch; row i predicts
        # the token after chain[i], so row len(proposals) is the correction
        # when everything is accepted
        chain = [last] + proposals
        pos = np.arange(n_past, n_past + len(chain), dtype=np.int32)
        rc = target.decode(Batch(np.array(chain, np.int32), pos,
                                 np.zeros(len(chain), np.int32),
                                 np.ones(len(chain), bool)))
        stats.n_target_calls += 1
        if rc != 0:
            break
        if greedy:  # one [n, 1] fetch for the whole verify batch
            t_choices = target.get_topk(1)[1][:, 0]
        else:
            t_logits = target.get_logits()  # [len(chain), vocab]
            t_choices = [sample(t_logits[i]) for i in range(len(chain))]
        stats.n_drafted += len(proposals)

        n_accept = 0
        for i, p in enumerate(proposals):
            if (int(t_choices[i]) == p and p != eos_id
                    and len(out) + n_accept + 1 < n_predict):
                n_accept += 1
            else:
                break
        stats.n_accepted += n_accept
        accepted = proposals[:n_accept]
        # the correction token comes from the target at the first mismatch
        correction = int(t_choices[n_accept])
        out.extend(accepted)
        out.append(correction)
        new_past = n_past + n_accept + 1

        # 3. roll back both caches past the accepted region
        target.seq_rm(0, new_past, -1)
        draft.seq_rm(0, new_past, -1)
        # draft hasn't seen the accepted chain's last token yet: its cache
        # holds [.. n_past + len(proposals)); trim to new_past
        n_past = new_past
        last = correction
    return out[:n_predict], stats


def speculative_generate_tree(
    target: LlamaContext,
    draft: LlamaContext,
    prompt_tokens,
    n_predict: int,
    n_draft: int = 5,
    n_branches: int = 4,
    p_split: float = 0.1,
    eos_id: int = -1,
) -> tuple[list[int], SpecStats]:
    """Tree-draft speculative decoding (parity: speculative.cpp seq_draft
    branches with p_split forking).

    When the draft's second-best token has probability > p_split * best, the
    draft forks a new branch (seq_cp) and both continuations are verified by
    the target in ONE batch — tree nodes share cache cells across branches
    via seq bitmasks (same machinery as lookahead decoding).  Greedy target
    verification keeps the output identical to plain greedy decoding.
    """
    assert target.n_seq_max > n_branches and draft.n_seq_max > n_branches
    prompt_tokens = np.asarray(prompt_tokens, np.int32)
    for c in (target, draft):
        c.clear()
        rc = c.decode(Batch.single(prompt_tokens))
        if rc != 0:
            raise RuntimeError("prefill failed")
    stats = SpecStats()
    out: list[int] = []
    last = int(target.get_topk(1)[1][0, 0])
    stats.n_target_calls += 1
    out.append(last)
    n_past = len(prompt_tokens)
    all_branch_mask = np.int32(sum(1 << b for b in range(1, n_branches + 1)))

    while len(out) < n_predict and last != eos_id:
        for c in (target, draft):
            for b in range(1, n_branches + 1):
                c.seq_cp(0, b)

        # -- draft phase: grow a token tree ---------------------------------
        # paths[b] = tokens decoded into the draft cache along branch b
        paths: dict[int, list[int]] = {1: []}
        next_tok: dict[int, int] = {1: int(last)}
        n_free = n_branches - 1
        ok = True
        for _depth in range(n_draft):
            active = [b for b in paths if len(paths[b]) == _depth]
            if not active:
                break
            toks = np.array([next_tok[b] for b in active], np.int32)
            pos = np.array([n_past + _depth] * len(active), np.int32)
            seqs = np.array(active, np.int32)
            mask = (np.int32(1) << seqs) if _depth > 0 else \
                np.full(len(active), all_branch_mask, np.int32)
            rc = draft.decode(Batch(toks, pos, seqs, np.ones(len(active), bool),
                                    mask))
            if rc != 0:
                ok = False
                break
            # device top-2: p2/p1 = exp(l2 - l1), so the p_split fork
            # test needs only [n, 2] values+ids, not the vocab row
            tv, ti = draft.get_topk(2)
            for i, b in enumerate(active):
                paths[b].append(next_tok[b])
                next_tok[b] = int(ti[i, 0])
                ratio = float(np.exp(np.float64(tv[i, 1]) - np.float64(tv[i, 0])))
                if n_free > 0 and ratio > p_split:
                    nb = next(x for x in range(1, n_branches + 1) if x not in paths)
                    draft.seq_cp(b, nb)
                    paths[nb] = list(paths[b])
                    next_tok[nb] = int(ti[i, 1])
                    n_free -= 1
        if not ok or not any(paths.values()):
            # cache exhausted or nothing drafted: plain decode of `last`
            target.seq_rm(-1, n_past, -1)
            draft.seq_rm(-1, n_past, -1)
            rc = target.decode(Batch(tokens=[last], pos=[n_past], seq_id=[0],
                                     output=[True]))
            if rc != 0:
                break
            last = int(target.get_topk(1)[1][0, 0])
            stats.n_target_calls += 1
            out.append(last)
            n_past += 1
            continue

        # -- build the node tree (keyed by root-relative token prefix) ------
        nodes: dict[tuple, dict] = {(): {"token": int(last), "branches": set(paths)}}
        for b, path in paths.items():
            for i in range(len(path) - 1):
                # path[0] == last == root; node i+1 holds path[i + 1]
                key = tuple(path[1 : i + 2])
                nd = nodes.setdefault(key, {"token": path[i + 1], "branches": set()})
                nd["branches"].add(b)
        for b, path in paths.items():
            # each branch's FINAL prediction becomes a leaf node too — the
            # deepest draft decode produced it, so dropping it wasted one
            # verifiable token per branch per round
            key = tuple(path[1:]) + (next_tok[b],)
            nd = nodes.setdefault(key, {"token": int(next_tok[b]),
                                        "branches": set(), "leaf": True})
            nd["branches"].add(b)
        stats.n_drafted += len(nodes) - 1

        # -- target verifies the whole tree in one batch --------------------
        keys = sorted(nodes, key=len)
        toks = np.array([nodes[k]["token"] for k in keys], np.int32)
        pos = np.array([n_past + len(k) for k in keys], np.int32)
        seqs = np.array([min(nodes[k]["branches"]) for k in keys], np.int32)
        mask = np.array([sum(1 << b for b in nodes[k]["branches"]) for k in keys],
                        np.int32)
        rc = target.decode(Batch(toks, pos, seqs, np.ones(len(keys), bool), mask))
        stats.n_target_calls += 1
        if rc != 0:
            break
        t_choices = target.get_topk(1)[1][:, 0]  # [n_nodes] device argmax
        row_of = {k: i for i, k in enumerate(keys)}

        cur: tuple = ()
        while True:
            t = int(t_choices[row_of[cur]])
            out.append(t)
            child = cur + (t,)
            if (child in nodes and t != eos_id
                    and len(out) < n_predict):
                stats.n_accepted += 1
                cur = child
            else:
                break
        best = min(nodes[cur]["branches"])
        n_past = n_past + len(cur) + 1
        last = out[-1]

        # -- keep the accepted branch, drop the rest (lookahead epilogue) ---
        for c in (target, draft):
            c.seq_rm(-1, n_past, -1)
            c.seq_keep(best)
            c.seq_cp(best, 0)
            c.seq_rm(best)
        if nodes[cur].get("leaf"):
            # an accepted leaf never entered the DRAFT cache (only paths
            # were draft-decoded): sync its row so next round's draft
            # attends contiguously
            draft.decode(Batch(tokens=[nodes[cur]["token"]],
                               pos=[n_past - 1], seq_id=[0], output=[False]))
    return out[:n_predict], stats


# -- prompt-lookup (ngram) drafting ------------------------------------------


@dataclass
class NgramCache:
    """min..max-order n-gram continuation cache (cf. common/ngram-cache.h)."""

    n_min: int = 2
    n_max: int = 4
    table: dict[tuple, dict[int, int]] = field(default_factory=dict)

    def update(self, tokens: list[int]) -> None:
        for n in range(self.n_min, self.n_max + 1):
            for i in range(len(tokens) - n):
                key = tuple(tokens[i : i + n])
                nxt = tokens[i + n]
                self.table.setdefault(key, {}).setdefault(nxt, 0)
                self.table[key][nxt] += 1

    def update_tail(self, tokens: list[int], n_new: int) -> None:
        """Incremental update: count only the n-grams whose continuation
        token is one of the last `n_new` tokens (re-running update over a
        sliding window would re-count the overlap and bias future drafts)."""
        total = len(tokens)
        for n in range(self.n_min, self.n_max + 1):
            for i in range(max(0, total - n_new - n), total - n):
                key = tuple(tokens[i : i + n])
                nxt = tokens[i + n]
                self.table.setdefault(key, {}).setdefault(nxt, 0)
                self.table[key][nxt] += 1

    def draft(self, tokens: list[int], n_draft: int) -> list[int]:
        out: list[int] = []
        cur = list(tokens)
        for _ in range(n_draft):
            best = None
            for n in range(self.n_max, self.n_min - 1, -1):
                key = tuple(cur[-n:])
                cands = self.table.get(key)
                if cands:
                    best = max(cands.items(), key=lambda kv: kv[1])[0]
                    break
            if best is None:
                break
            out.append(best)
            cur.append(best)
        return out


def lookup_generate(
    target: LlamaContext,
    prompt_tokens,
    n_predict: int,
    n_draft: int = 4,
    eos_id: int = -1,
) -> tuple[list[int], SpecStats]:
    """Prompt-lookup decoding: n-gram drafts verified by the target.

    Output equals plain greedy decoding of the target.
    """
    prompt_tokens = np.asarray(prompt_tokens, np.int32)
    target.clear()
    rc = target.decode(Batch.single(prompt_tokens))
    if rc != 0:
        raise RuntimeError("prefill failed")
    cache = NgramCache()
    history = [int(t) for t in prompt_tokens]
    cache.update(history)
    stats = SpecStats()
    out: list[int] = []
    last = int(target.get_topk(1)[1][0, 0])
    stats.n_target_calls += 1
    out.append(last)
    history.append(last)
    n_past = len(prompt_tokens)

    while len(out) < n_predict and last != eos_id:
        proposals = cache.draft(history, n_draft)
        chain = [last] + proposals
        pos = np.arange(n_past, n_past + len(chain), dtype=np.int32)
        rc = target.decode(Batch(np.array(chain, np.int32), pos,
                                 np.zeros(len(chain), np.int32),
                                 np.ones(len(chain), bool)))
        stats.n_target_calls += 1
        if rc != 0:
            break
        t_choices = target.get_topk(1)[1][:, 0]
        stats.n_drafted += len(proposals)
        n_accept = 0
        for i, p in enumerate(proposals):
            if int(t_choices[i]) == p and p != eos_id \
                    and len(out) + n_accept + 1 < n_predict:
                n_accept += 1
            else:
                break
        stats.n_accepted += n_accept
        correction = int(t_choices[n_accept])
        accepted = proposals[:n_accept]
        out.extend(accepted)
        out.append(correction)
        history.extend(accepted + [correction])
        cache.update_tail(history, n_accept + 1)
        n_past += n_accept + 1
        target.seq_rm(0, n_past, -1)
        last = correction
    return out[:n_predict], stats


# -- fully on-device speculative loop ----------------------------------------


def speculative_generate_device(
    target: LlamaContext,
    draft: LlamaContext,
    prompt_tokens,
    n_predict: int,
    n_draft: int = 5,
    eos_id: int = -1,
) -> tuple[list[int], SpecStats]:
    """Greedy speculative decoding with draft, verify, acceptance, and
    cache rollback ALL inside one jitted device loop — a single dispatch
    for the whole generation.

    The reference's speculative example is host-driven because CUDA
    launches cost microseconds (examples/speculative/speculative.cpp);
    through the axon tunnel every dispatch costs ~25-35 ms, which made
    host-driven speculation slower than plain decode at any model scale
    (round-5 device log).  TPU-native structure: a lax.while_loop whose
    body runs a K-step lax.scan of draft forwards, one K+1 verify forward
    of the target, prefix-match acceptance (the same accept rules as
    speculative_generate — output identical to plain greedy), and
    metadata-level rollback of rejected cells on both caches.

    Per round the loop consumes K draft cells and K+1 target cells from
    pre-allocated slot grids; worst case (0 accepts) one round per token.
    Output tokens identical to plain greedy decoding of the target.
    """
    import jax
    import jax.numpy as jnp

    from llama_kotlin_tpu.models import llama as llama_model

    prompt_tokens = np.asarray(prompt_tokens, np.int32)
    for c in (target, draft):
        c.clear()
        if c.decode(Batch.single(prompt_tokens)) != 0:
            raise RuntimeError("prefill failed")
    stats = SpecStats()
    last0 = int(target.get_topk(1)[1][0, 0])
    n_past0 = len(prompt_tokens)
    K = n_draft
    R = n_predict  # worst-case rounds (>=1 token per round)

    # pre-allocate per-round cell slots on the host allocators
    slots_t = target.meta.find_slots(R * (K + 1))
    slots_d = draft.meta.find_slots(R * K)
    if slots_t is None or slots_d is None:
        # not enough cells to run fully on device: host-driven fallback
        return speculative_generate(target, draft, prompt_tokens, n_predict,
                                    n_draft=n_draft, eos_id=eos_id)
    # commit with pos=-1 (invalid) — the device loop stamps real positions
    target.meta.commit(slots_t, np.full(R * (K + 1), -1, np.int32),
                       np.zeros(R * (K + 1), np.int32))
    draft.meta.commit(slots_d, np.full(R * K, -1, np.int32),
                      np.zeros(R * K, np.int32))
    span_t = max(int(slots_t.max()), n_past0) + 1
    span_d = max(int(slots_d.max()), n_past0) + 1
    nv_t = next((b for b in getattr(target, "_vis_buckets",
                                    (target.n_cells,)) if b >= span_t),
                target.n_cells)
    nv_d = next((b for b in getattr(draft, "_vis_buckets",
                                    (draft.n_cells,)) if b >= span_d),
                draft.n_cells)
    cpos_t, cseq_t = target.meta.device_view(nv_t)
    cpos_d, cseq_d = draft.meta.device_view(nv_d)
    st_dev = jnp.asarray(slots_t.reshape(R, K + 1))
    sd_dev = jnp.asarray(slots_d.reshape(R, K))
    ct, cd = target.cache, draft.cache
    cfg_t, cfg_d = target.cfg, draft.cfg
    dt_t, dt_d = target.compute_dtype, draft.compute_dtype

    def round_body(carry):
        (out_buf, n_out, last, base, ct, cd, cpos_t, cseq_t, cpos_d,
         cseq_d, r, n_drafted, n_accepted, n_verify, done) = carry
        sd_r = sd_dev[r]
        st_r = st_dev[r]

        # ---- draft chain: K single-token forwards (lax.scan) ----------
        def draft_step(carry_d, i):
            tok, cd, cpos_d, cseq_d = carry_d
            pos = base + i
            slot = sd_r[i]
            cpos_d2 = cpos_d.at[slot].set(pos)
            cseq_d2 = cseq_d.at[slot].set(jnp.int32(1))
            logits, cd2, _ = llama_model.forward(
                draft.params, cfg_d, tok[None], pos[None],
                jnp.zeros(1, jnp.int32), slot[None], cd, cpos_d2, cseq_d2,
                jnp.zeros(1, jnp.int32), compute_dtype=dt_d)
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            return (nxt, cd2, cpos_d2, cseq_d2), nxt

        (_, cd, cpos_d, cseq_d), proposals = jax.lax.scan(
            draft_step, (last, cd, cpos_d, cseq_d), jnp.arange(K))

        # ---- target verifies [last] + proposals in one batch ----------
        chain = jnp.concatenate([last[None], proposals])  # [K+1]
        pos_v = base + jnp.arange(K + 1)
        cpos_t = cpos_t.at[st_r].set(pos_v)
        cseq_t = cseq_t.at[st_r].set(jnp.int32(1))
        logits, ct, _ = llama_model.forward(
            target.params, cfg_t, chain, pos_v,
            jnp.zeros(K + 1, jnp.int32), st_r, ct, cpos_t, cseq_t,
            jnp.arange(K + 1, dtype=jnp.int32), compute_dtype=dt_t)
        t_choices = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [K+1]

        # ---- acceptance (same rules as the host path) -----------------
        i_idx = jnp.arange(K)
        ok = ((t_choices[:K] == proposals)
              & (proposals != eos_id)
              & (n_out + i_idx + 1 < n_predict))
        pref = jnp.cumprod(ok.astype(jnp.int32))
        n_acc = jnp.sum(pref)
        correction = t_choices[n_acc]

        # ---- emit proposals[:n_acc] + correction ----------------------
        emit_idx = jnp.arange(K + 1)
        emit_tok = jnp.where(emit_idx < n_acc,
                             jnp.concatenate([proposals, proposals[-1:]]),
                             correction)
        write_at = jnp.where(emit_idx <= n_acc, n_out + emit_idx,
                             jnp.int32(out_buf.shape[0]))  # OOB -> dropped
        out_buf = out_buf.at[write_at].set(emit_tok, mode="drop")

        # ---- rollback rejected cells (metadata-level) -----------------
        keep_t = jnp.arange(K + 1) <= n_acc
        cpos_t = cpos_t.at[st_r].set(jnp.where(keep_t, pos_v, -1))
        keep_d = jnp.arange(K) <= n_acc
        cpos_d = cpos_d.at[sd_r].set(
            jnp.where(keep_d, base + jnp.arange(K), -1))

        n_out = jnp.minimum(n_out + n_acc + 1, jnp.int32(n_predict))
        done = (correction == eos_id) | (n_out >= n_predict)
        return (out_buf, n_out, correction, base + n_acc + 1, ct, cd,
                cpos_t, cseq_t, cpos_d, cseq_d, r + 1,
                n_drafted + K, n_accepted + n_acc, n_verify + 1, done)

    def cond(carry):
        return ~carry[-1]

    @jax.jit
    def run(ct, cd, cpos_t, cseq_t, cpos_d, cseq_d, last0):
        out_buf = jnp.full((n_predict,), -1, jnp.int32)
        carry = (out_buf, jnp.int32(1), last0, jnp.int32(n_past0),
                 ct, cd, cpos_t, cseq_t, cpos_d, cseq_d, jnp.int32(0),
                 jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.bool_(False))
        # the first generated token (from the prompt's logits) occupies
        # out_buf[0]; rounds fill from index 1
        carry = (carry[0].at[0].set(last0),) + carry[1:]
        carry = jax.lax.while_loop(cond, round_body, carry)
        return carry

    (out_buf, n_out, _last, _base, ct, cd, cpos_t, cseq_t, cpos_d, cseq_d,
     rounds, n_drafted, n_accepted, n_verify, _done) = run(
        ct, cd, cpos_t, cseq_t, cpos_d, cseq_d, jnp.int32(last0))
    target.cache, draft.cache = ct, cd
    # sync host metadata from the loop's final device state
    target.meta.pos[:nv_t] = np.asarray(cpos_t)
    target.meta.seq[:nv_t] = np.asarray(cseq_t)
    draft.meta.pos[:nv_d] = np.asarray(cpos_d)
    draft.meta.seq[:nv_d] = np.asarray(cseq_d)
    stats.n_drafted = int(n_drafted)
    stats.n_accepted = int(n_accepted)
    stats.n_target_calls = int(n_verify) + 1
    toks = [int(t) for t in np.asarray(out_buf[: int(n_out)])]
    if eos_id >= 0 and eos_id in toks:
        toks = toks[: toks.index(eos_id) + 1]
    return toks, stats
