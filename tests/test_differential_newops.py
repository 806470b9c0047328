"""Differential hunts for the continuation-session operators: Spark vs a
pure-Python brute-force replay on seeded pseudo-random inputs — the same
strategy the kernel differential suite uses against the reference."""

import random


def test_bpe_differential_python_replay(spark):
    """bpe_train on random small corpora == a from-first-principles Python
    replay of the same (replace-based) merge semantics."""
    from picogeojson_spark.operators.bpe import bpe_train

    rng = random.Random(42)
    vocab = ["low", "lower", "newest", "wide", "widest", "news", "lowest"]
    for trial in range(3):
        texts = [" ".join(rng.choices(vocab, k=rng.randint(3, 12)))
                 for _ in range(rng.randint(3, 8))]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        got = [(r["merge_idx"], r["left_sym"], r["right_sym"],
                r["pair_count"]) for r in bpe_train(docs, n_merges=5).collect()]

        # python replay: word freqs -> padded symbol strings -> greedy
        # leftmost-non-overlap replace rounds with the same tie-break
        import re
        from collections import Counter

        freqs = Counter()
        for t in texts:
            freqs.update(re.findall("[a-z]+", t.lower()))
        syms = {w: " " + " ".join(w) + " " for w in freqs}
        want = []
        for i in range(1, 6):
            pairs = Counter()
            for w, s in syms.items():
                toks = s.split()
                for a, b in zip(toks, toks[1:]):
                    pairs[(a, b)] += freqs[w]
            if not pairs:
                break
            (l, r), cnt = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            want.append((i, l, r, cnt))
            syms = {w: s.replace(" {} {} ".format(l, r),
                                 " {}{} ".format(l, r))
                    for w, s in syms.items()}
        assert got == want, (trial, got, want)


def test_funnel_differential_python_replay(spark):
    """funnel_counts on random event logs == brute-force greedy replay."""
    from picogeojson_spark.operators.funnel import funnel_counts

    rng = random.Random(7)
    steps = ["a", "b", "c"]
    gap = 50
    for trial in range(3):
        rows = [(u, rng.choice(steps + ["x"]), rng.randint(0, 300))
                for u in range(12) for _ in range(rng.randint(0, 10))]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts_us long")
        got = {r["step"]: r["n_users"]
               for r in funnel_counts(df, steps, gap).collect()}

        by_user = {}
        for u, t, ts in rows:
            by_user.setdefault(u, []).append((t, ts))
        want = {s: 0 for s in steps}
        for u, evs in by_user.items():
            t_prev = None
            for si, s in enumerate(steps):
                cand = [ts for t, ts in evs if t == s
                        and (si == 0 or (t_prev is not None
                                         and t_prev < ts <= t_prev + gap))]
                if si == 0:
                    cand = [ts for t, ts in evs if t == s]
                if not cand:
                    break
                t_prev = min(cand)
                want[s] += 1
        assert got == want, (trial, got, want)


def test_quality_adaptive_differential_python_replay(spark):
    """quality_percentile_flags == brute-force sort-based percentile on
    random multi-group corpora (the histogram formulation must equal the
    naive sorted-rank one)."""
    from picogeojson_spark.operators.textstats import (
        quality_percentile_flags,
    )

    rng = random.Random(99)
    for keep_pct in (10, 30, 75, 100):
        rows = []
        i = 0
        for lang in ("en", "de", "fr"):
            for _ in range(rng.randint(4, 25)):
                i += 1
                words = rng.randint(0, 30)
                rows.append((i, lang,
                             "the and of " * rng.randint(0, 4)
                             + "pad " * words))
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, text string")
        out = quality_percentile_flags(docs, keep_pct=keep_pct).collect()
        scores = {}
        for r in out:
            scores.setdefault(r["lang"], []).append(r["score"])
        p = 100 - keep_pct
        for r in out:
            vals = sorted(scores[r["lang"]])
            pos = (p * len(vals) + 99) // 100
            cutoff = vals[max(pos - 1, 0)]
            assert r["cutoff"] == cutoff, (keep_pct, r)
            assert r["keep"] == (r["score"] >= cutoff), (keep_pct, r)
