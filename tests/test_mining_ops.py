"""Independent python rederivations for the round-8 mining surface
(plans/mining_ops.py): BPE merge learning vs a pure-Counter trainer,
top-3-paths vs a per-user zip walk, ROUGE-1 vs multiset intersection,
and rolling quantiles vs numpy interpolation — different algorithm
shapes than both the Spark plans and the DuckDB oracles."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _docs(spark):
    from gwasdb_spark.catalog import table

    return table(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()


# --------------------------------------------------------------- x140 --


def _python_bpe(texts, k=20):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    syms = {w: tuple(list(w) + ["</w>"]) for w in vocab}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max freq, ties lexicographic on (left, right)
        (left, right), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, freq))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def test_bpe_learn_matches_python(spark):
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    expect = _python_bpe(pdf["text"].to_list(), k=20)
    rows = QUERIES["x140_bpe_learn"].fn(spark, SF_DIR).collect()
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in sorted(rows, key=lambda r: r["rank"])
    ]
    assert got == expect  # exact — every rank, symbol, and count
    # merge ranks are strictly decreasing-or-equal in frequency only
    # within ties; the defining invariant is monotone niche: each
    # merge's pair_freq is the max over the state its rank saw, so the
    # sequence needs no global monotonicity — but ranks must be 1..20
    assert [g[0] for g in got] == list(range(1, 21))


# ---------------------------------------------------------------- e11 --


def test_top_paths_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    paths = Counter()
    for _, grp in e.groupby("user_id"):
        t = grp["event_type"].to_list()
        for a, b, c in zip(t, t[1:], t[2:]):
            paths[f"{a}>{b}>{c}"] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = QUERIES["e11_top_paths"].fn(spark, SF_DIR).collect()
    assert [(r["path"], r["n_paths"]) for r in rows] == expect


# --------------------------------------------------------------- x139 --


def test_rouge_overlap_matches_python(spark):
    from gwasdb_spark.operators.dedup import ngram_jaccard_pairs
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    toks = {
        r.doc_id: Counter(w for w in re.split(r"\s+", r.text.strip()))
        for r in pdf.itertuples()
    }
    d = table(spark, SF_DIR, "documents")
    pair_rows = ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    ).collect()
    expect = {}
    for p in pair_rows:
        ca, cb = toks[p["id_a"]], toks[p["id_b"]]
        ov = sum((ca & cb).values())
        na, nb = sum(ca.values()), sum(cb.values())
        expect[(p["id_a"], p["id_b"])] = (ov, round(2.0 * ov / (na + nb), 9))
    rows = QUERIES["x139_rouge_overlap"].fn(spark, SF_DIR).collect()
    got = {
        (r["id_a"], r["id_b"]): (r["n_overlap"], r["rouge1_f1"]) for r in rows
    }
    # pairs with zero token overlap drop out of the inner join in both
    # engines; every surviving pair must match exactly
    assert set(got) == {k for k, v in expect.items() if v[0] > 0}
    for k, v in got.items():
        assert v[0] == expect[k][0]
        assert abs(v[1] - expect[k][1]) < 1e-9
    assert len(got) >= 1  # the planted near-dups overlap


# ---------------------------------------------------------------- w11 --


def test_rolling_median_matches_numpy(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    o = table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": pd.to_datetime(o["o_orderdate"]), "x": cents})
        .groupby("day", sort=True)["x"]
        .sum()
        .astype("float64")
    )
    xs = daily.to_numpy()
    expect = {}
    for i, day in enumerate(daily.index):
        w = xs[max(0, i - 6) : i + 1]
        expect[day.strftime("%Y-%m-%d")] = (
            int(xs[i]),
            round(float(np.quantile(w, 0.5)), 6),  # linear interpolation
            round(float(np.quantile(w, 0.9)), 6),
        )
    rows = QUERIES["w11_rolling_median"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        x, med, p90 = expect[r["day"]]
        assert r["revenue_cents"] == x
        assert abs(r["med7"] - med) < 1e-6
        assert abs(r["p90_7"] - p90) < 1e-6


# --------------------------------------------------------------- x141 --


def test_pca_top_component_matches_numpy(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    pdf = table(spark, SF_DIR, "embeddings").select("embedding").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    v = np.full(X.shape[1], 0.125)
    for _ in range(20):
        v = C @ v
    lam = float(v @ (C @ v) / (v @ v))
    v = v / np.linalg.norm(v)
    k = min(range(len(v)), key=lambda i: (-abs(v[i]), i))
    if v[k] < 0:
        v = -v
    rows = QUERIES["x141_pca_top_component"].fn(spark, SF_DIR).collect()
    assert len(rows) == X.shape[1]
    for r in rows:
        assert abs(r["loading"] - v[r["dim"] - 1]) < 1e-5
        assert abs(r["eigenvalue"] - lam) < 1e-5
    # The contract is the deterministic 20-step polynomial iterate
    # C^20 v0 (identical in both engines), NOT convergence to the true
    # eigenvector: this corpus's spectrum is near-flat (random-ish
    # embeddings), so 20 steps only PARTIALLY rotate toward the top
    # eigenspace. Sanity: the iterate's Rayleigh quotient must beat the
    # average eigenvalue (it strictly improves from the uniform start),
    # and the loadings are unit-norm.
    w_, V_ = np.linalg.eigh(C)
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    lam_got = rows[0]["eigenvalue"]
    assert lam_got > w_.mean()
    assert lam_got <= w_.max() + 1e-9
    assert abs(np.linalg.norm(got) - 1.0) < 1e-4


# --------------------------------------------------------------- x150 --


def test_bpe_apply_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    docs = (
        table(spark, SF_DIR, "documents")
        .select("source", "text")
        .toPandas()
    )
    merges = [(l, r) for _, l, r, _, _ in _python_bpe(docs["text"].to_list(), k=20)]

    def encode_len(word):
        syms = list(word) + ["</w>"]
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expect = {}
    for src, grp in docs.groupby("source"):
        n_docs = len(grp)
        n_words = n_tokens = 0
        for t in grp["text"]:
            ws = [w for w in re.split(r"\s+", t.strip()) if w]
            n_words += len(ws)
            n_tokens += sum(encode_len(w) for w in ws)
        expect[src] = (n_docs, n_words, n_tokens, round(n_tokens / n_words, 9))
    rows = QUERIES["x150_bpe_apply"].fn(spark, SF_DIR).collect()
    got = {
        r["source"]: (r["n_docs"], r["n_words"], r["n_tokens"], r["fertility"])
        for r in rows
    }
    assert got == expect
    # merges can only shrink the char+marker baseline
    for src, (_, n_words, n_tokens, fert) in expect.items():
        assert fert >= 1.0  # every word is at least one token


# ---------------------------------------------------------------- e12 --


def test_cohort_ltv_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "value")
        .toPandas()
    )
    first = e.groupby("user_id")["ts"].min()
    cohort = first.dt.to_period("W").dt.start_time  # Monday-start weeks
    sizes = cohort.value_counts()
    purch = e[e["event_type"] == "purchase"].copy()
    purch["first_ts"] = purch["user_id"].map(first)
    purch["cohort"] = purch["user_id"].map(cohort)
    purch["week_no"] = (
        (purch["ts"].dt.normalize() - purch["first_ts"].dt.normalize()).dt.days
        // 7
    )
    purch["cents"] = (purch["value"] * 100).round().astype("int64")
    rev = purch.groupby(["cohort", "week_no"])["cents"].sum().sort_index()
    expect = {}
    for (c, w), cents in rev.items():
        prior = sum(
            v for (c2, w2), v in rev.items() if c2 == c and w2 <= w
        )
        n_users = int(sizes[c])
        expect[(c.strftime("%Y-%m-%d"), int(w))] = (
            n_users,
            int(cents),
            int(prior),
            round(prior / 100.0 / n_users, 6),
        )
    rows = QUERIES["e12_cohort_ltv"].fn(spark, SF_DIR).collect()
    got = {
        (r["cohort_week"], r["week_no"]): (
            r["n_users"],
            r["week_revenue_cents"],
            r["cum_revenue_cents"],
            r["ltv_per_user"],
        )
        for r in rows
    }
    assert got == expect


# ---------------------------------------------------------------- g17 --


def test_manhattan_bins_matches_python(spark):
    from gwasdb_spark.plans import QUERIES

    import math

    # rederive the synthetic assoc directly from its integer formula
    from gwasdb_spark.catalog import table

    n = 4 * table(spark, SF_DIR, "lineitem").count()
    best = {}
    for vid in range(n):
        chrom = vid % 22 + 1
        pos = 1 + (vid * 997) % 50_000_000
        p = ((vid * 2654435761) % 1000003) / 1000003.0
        key = (chrom, pos // 1_000_000)
        cur = best.get(key)
        if cur is None:
            best[key] = [1, p, vid]
        else:
            cur[0] += 1
            if p < cur[1] or (p == cur[1] and vid < cur[2]):
                cur[1], cur[2] = p, vid
    rows = QUERIES["g17_manhattan_bins"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(best)
    for r in rows:
        nv, mp, lead = best[(r["chr"], r["mb"])]
        assert r["n_variants"] == nv
        assert r["lead_variant"] == lead
        assert abs(r["min_p"] - round(mp, 9)) < 1e-12
        if mp > 0:
            assert abs(r["peak_nlp"] - round(-math.log10(mp), 6)) < 1e-9
        else:
            assert r["peak_nlp"] is None


# --------------------------------------------------------------- x151 --


def test_winnowing_matches_python(spark):
    import hashlib

    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    fps = {}
    grams_n = {}
    for r in pdf.itertuples():
        ws = re.split(r"\s+", r.text.strip())
        gh = [
            int(hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()[:15], 16)
            for i in range(max(len(ws) - 2, 0))
        ]
        grams_n[r.doc_id] = len(gh)
        sel = {min(gh[p : p + 4]) for p in range(max(len(gh) - 3, 0))}
        if sel:
            fps[r.doc_id] = sel
    from collections import Counter as _C

    freq = _C()
    for s in fps.values():
        for f in s:
            freq[f] += 1
    rows = QUERIES["x151_winnowing_fingerprints"].fn(spark, SF_DIR).collect()
    assert {r["doc_id"] for r in rows} == set(fps)
    for r in rows:
        sel = fps[r["doc_id"]]
        assert r["n_grams"] == grams_n[r["doc_id"]]
        assert r["n_fingerprints"] == len(sel)
        assert r["n_shared_fp"] == sum(1 for f in sel if freq[f] >= 2)
    # the winnowing guarantee on the planted near-dups: some sharing
    assert any(r["n_shared_fp"] > 0 for r in rows)


# ---------------------------------------------------------------- e13 --


def test_dau_stickiness_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = table(spark, SF_DIR, "events").select("user_id", "ts").toPandas()
    e["day"] = e["ts"].dt.normalize()
    ud = e[["user_id", "day"]].drop_duplicates()
    days = sorted(ud["day"].unique())
    by_day = ud.groupby("day")["user_id"].apply(set)
    expect = {}
    for d in days:
        dau = len(by_day[d])
        wau = len(
            set().union(
                *(by_day[x] for x in days if 0 <= (d - x).days < 7)
            )
        )
        mau = len(
            set().union(
                *(by_day[x] for x in days if 0 <= (d - x).days < 28)
            )
        )
        expect[pd.Timestamp(d).strftime("%Y-%m-%d")] = (
            dau,
            wau,
            mau,
            round(dau / wau, 9),
            round(dau / mau, 9),
        )
    rows = QUERIES["e13_dau_stickiness"].fn(spark, SF_DIR).collect()
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"], r["dau_wau"], r["dau_mau"])
        for r in rows
    }
    assert got == expect


# ---------------------------------------------------------------- w12 --


def test_yoy_revenue_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    o = table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    monthly = (
        pd.DataFrame(
            {
                "m": pd.to_datetime(o["o_orderdate"]).dt.to_period("M"),
                "c": cents,
            }
        )
        .groupby("m", sort=True)["c"]
        .sum()
    )
    keys = list(monthly.index)
    expect = {}
    for i, k in enumerate(keys):
        cur = int(monthly.iloc[i])
        prev = int(monthly.iloc[i - 12]) if i >= 12 else None
        change = round((cur - prev) / prev, 9) if prev is not None else None
        expect[str(k)] = (cur, prev, change)
    rows = QUERIES["w12_yoy_revenue"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        cur, prev, change = expect[r["month"]]
        assert r["revenue_cents"] == cur
        assert r["prev_year_cents"] == prev
        if change is None:
            assert r["yoy_change"] is None
        else:
            assert abs(r["yoy_change"] - change) < 1e-9


# --------------------------------------------------------------- st17 --


def test_stream_dau_equals_batch(spark):
    from gwasdb_spark.plans import QUERIES

    got = {
        r["day"]: r["dau"]
        for r in QUERIES["st17_stream_dau"].fn(spark, SF_DIR).collect()
    }
    batch = {
        r["day"]: r["dau"]
        for r in QUERIES["e13_dau_stickiness"].fn(spark, SF_DIR).collect()
    }
    assert got == batch  # streaming replay == batch distinct count


# --------------------------------------------------------------- x152 --


def test_sliced_auc_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.functions.text import quality_classifier_prob
    from gwasdb_spark.plans import QUERIES
    from pyspark.sql import functions as F

    pdf = (
        table(spark, SF_DIR, "documents")
        .select(
            "source",
            F.round(quality_classifier_prob(F.col("text")), 9).alias("s"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .toPandas()
    )
    expect = {}
    for src, grp in pdf.groupby("source"):
        scores = grp["s"].to_numpy()
        pos = grp["pos"].to_numpy()
        npos, nneg = int(pos.sum()), int(len(pos) - pos.sum())
        if npos == 0 or nneg == 0:
            expect[src] = (npos, nneg, None)
            continue
        # tie-corrected rank-sum (average ranks)
        order = np.argsort(scores, kind="stable")
        ranks = np.empty(len(scores))
        sorted_scores = scores[order]
        i = 0
        while i < len(scores):
            j = i
            while j < len(scores) and sorted_scores[j] == sorted_scores[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
            i = j
        rpos = ranks[pos == 1].sum()
        auc = (rpos - npos * (npos + 1) / 2.0) / (npos * nneg)
        expect[src] = (npos, nneg, round(auc, 9))
    rows = QUERIES["x152_sliced_auc"].fn(spark, SF_DIR).collect()
    got = {r["source"]: (r["n_pos"], r["n_neg"], r["auc"]) for r in rows}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0] and got[k][1] == expect[k][1]
        if expect[k][2] is None:
            assert got[k][2] is None
        else:
            assert abs(got[k][2] - expect[k][2]) < 1e-9, (k, got[k], expect[k])


# ---------------------------------------------------------------- g18 --


def test_proxy_variant_matches_bruteforce(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    n = 4 * table(spark, SF_DIR, "lineitem").count()
    assoc = []
    for vid in range(n):
        p = ((vid * 2654435761) % 1000003) / 1000003.0
        assoc.append((vid % 22 + 1, 1 + (vid * 997) % 50_000_000, vid, p))
    sig = [(c, pp, v) for c, pp, v, p in assoc if p < 0.0001]
    qs = [(c, pp, v) for c, pp, v, p in assoc if 0.0001 <= p < 0.001]
    by_chr = defaultdict(list)
    for c, pp, v in sig:
        by_chr[c].append((pp, v))
    expect = {}
    for c, pp, v in qs:
        best = None
        for sp, sv in by_chr.get(c, ()):
            d = abs(pp - sp)
            if d <= 500_000 and sv != v:
                k = (d, sv)
                if best is None or k < best:
                    best = k
        expect[v] = best  # None or (dist, proxy)
    rows = QUERIES["g18_proxy_variant"].fn(spark, SF_DIR).collect()
    assert {r["variant_id"] for r in rows} == set(expect)
    for r in rows:
        b = expect[r["variant_id"]]
        if b is None:
            assert r["proxy_variant"] is None and r["proxy_distance"] is None
        else:
            assert (r["proxy_distance"], r["proxy_variant"]) == b
    # populated rows appear exactly when the brute force finds a
    # neighbor (at sf0.001 the significant set is ~2 variants over
    # 50 Mb x 22 chromosomes, so all-orphan is the expected outcome)
    assert sum(r["proxy_variant"] is not None for r in rows) == sum(
        1 for b in expect.values() if b is not None
    )


# --------------------------------------------------------------- mm09 --


def test_chunk_manifest_matches_hashlib(spark):
    import hashlib

    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    expect = {}
    for r in pdf.itertuples():
        payload = r.text.encode("utf-8")
        for k in range((len(payload) + 4095) // 4096):
            sl = payload[k * 4096 : (k + 1) * 4096]
            expect[(r.doc_id, k)] = (
                k * 4096,
                len(sl),
                hashlib.md5(sl.hex().encode()).hexdigest(),
            )
    rows = QUERIES["mm09_chunk_manifest"].fn(spark, SF_DIR).collect()
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["byte_offset"],
            r["n_bytes"],
            r["digest"],
        )
        for r in rows
    }
    assert got == expect


# ------------------------------------------------- BPE merge staging --


def test_bpe_merge_stage_roundtrip(spark):
    """x140 writes the learned merge table through to the corpus-keyed
    stage; x150's loader reads it back identically when warm, and a
    cold stage re-learns the identical table (train once, tokenize
    many — the apply job must never re-run the 20-job learn loop)."""
    import shutil

    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.mining_ops import (
        _bpe_learned_merges,
        _bpe_merges_stage,
    )

    import os as _os

    learned = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in sorted(
            QUERIES["x140_bpe_learn"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["rank"],
        )
    ]
    path = _bpe_merges_stage(SF_DIR)
    assert _os.path.isdir(path), "x140 did not write the merge stage"
    # warm: read-back is bit-identical to the learn output
    assert _bpe_learned_merges(spark, SF_DIR) == learned
    # cold: the loader re-learns the identical table and re-stages it
    shutil.rmtree(path)
    assert _bpe_learned_merges(spark, SF_DIR) == learned
    assert _os.path.isdir(path)
