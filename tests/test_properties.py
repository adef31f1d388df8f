"""Property-based tests (SURVEY.md §5.2): date derivations, surrogate
keys, and load-partitioning invariants under hypothesis-generated
inputs, the golden end-to-end cube snapshot, and round-5 operator
properties (sequence packing, CDC replay, PII redaction)."""

from __future__ import annotations

import datetime
import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawarehouse_code_spark.pipeline import build_warehouse
from tests.conftest import SF_DIR

_DATES = st.dates(datetime.date(1990, 1, 1), datetime.date(2035, 12, 31))


@given(st.lists(_DATES, min_size=1, max_size=40, unique=True))
@settings(max_examples=12, deadline=None)
def test_quarter_and_date_key_properties(dates):
    """quarter_start_month ∈ {1,4,7,10} and consistent with the month;
    date_key is injective and ordered like the dates themselves."""
    import tests.conftest as c

    spark = _spark_handle(c)
    from datawarehouse_code_spark.functions.scalars import date_key, quarter_start_month

    df = spark.createDataFrame([(d,) for d in dates], "d DATE").select(
        "d",
        quarter_start_month(F.col("d")).alias("q"),
        date_key(F.col("d")).alias("k"),
    )
    rows = df.collect()
    for r in rows:
        assert r["q"] == ((r["d"].month - 1) // 3) * 3 + 1
    keys = [r["k"] for r in sorted(rows, key=lambda r: r["d"])]
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)


_spark_ref = {}


def _spark_handle(_c):
    if "s" not in _spark_ref:
        from datawarehouse_code_spark.session import get_spark

        _spark_ref["s"] = get_spark("tests", cpus="8")
    return _spark_ref["s"]


def test_union_of_year_partitions_equals_whole(spark):
    """Partitioned-load invariant: the union of per-year slices of the
    fact equals the whole fact (no row lost or duplicated by the
    partitioning)."""
    fact = build_warehouse(spark, SF_DIR).fact
    years = [r["year"] for r in fact.select("year").distinct().collect()]
    parts = None
    for y in years:
        sl = fact.filter(F.col("year") == y)
        parts = sl if parts is None else parts.unionByName(sl)
    assert parts.count() == fact.count()
    assert parts.exceptAll(fact).count() == 0
    assert fact.exceptAll(parts).count() == 0


# regenerated 2026-08-13: surrogate key encoding became injective
# (length-prefixed, NULL-sentinel), changing every fact_id
GOLDEN_CUBE_SHA256 = "4cdd5a9cf024798c0bd6001fb8f35c577b3295d297cbae0ccc081303875ce186"


def test_golden_cube_snapshot(spark):
    """Golden end-to-end check (SURVEY §5.2): the sf0.001 cube hashes
    to a pinned value — any semantics drift in dims/fact/cube breaks
    this immediately.  Regenerate the constant ONLY for an intended
    semantics change (print the new hash from this test's failure)."""
    cube = build_warehouse(spark, SF_DIR).cube
    lines = []
    for r in cube.collect():
        vals = []
        for c in sorted(cube.columns):
            v = r[c]
            if isinstance(v, float):
                v = "%.6f" % v
            elif isinstance(v, datetime.date):
                v = v.isoformat()
            vals.append(str(v))
        lines.append("|".join(vals))
    h = hashlib.sha256("\n".join(sorted(lines)).encode()).hexdigest()
    assert h == GOLDEN_CUBE_SHA256, f"cube snapshot drifted: {h}"


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1, max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=0, max_size=30,
    ),
)
@settings(max_examples=15, deadline=None)
def test_asof_join_matches_pandas_merge_asof(left_rows, right_rows):
    """asof_join_backward agrees with pandas merge_asof (backward,
    exact matches allowed) on arbitrary key/ts data.  Right (key, ts)
    pairs are deduplicated so the match is unambiguous (our tiebreak
    and pandas' input-order rule would otherwise pick different rows
    legitimately)."""
    import pandas as pd

    import tests.conftest as c
    from datawarehouse_code_spark.operators.joins import asof_join_backward

    spark = _spark_handle(c)
    seen = set()
    right_uniq = []
    for k, ts, rid in right_rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_uniq.append((k, ts, rid))
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts, _) in enumerate(left_rows)],
        "k int, ts int, lid int",
    )
    right = spark.createDataFrame(right_uniq or [(99, 0, 0)], "k int, ts int, rid int")
    if not right_uniq:
        right = right.filter("k < 0")  # truly empty, schema kept
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join_backward(
            left, right, keys=["k"], ts_col="ts", payload_cols=["rid"],
            right_tiebreak="rid",
        ).collect()
    }

    lpdf = pd.DataFrame(
        [(k, ts, i) for i, (k, ts, _) in enumerate(left_rows)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rpdf = pd.DataFrame(right_uniq, columns=["k", "ts", "rid"]).sort_values(
        "ts", kind="stable"
    )
    if rpdf.empty:
        want = {int(lid): None for lid in lpdf["lid"]}
    else:
        merged = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k", direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 400)),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_pack_sequences_properties(docs):
    """Concat-and-chunk invariants for arbitrary shard/token inputs:
    per-shard offsets are dense (each doc starts where the previous
    ended), seq bounds bracket the doc's span, and every boundary
    crossing is reflected in seq_last - seq_first."""
    import tests.conftest as c

    from datawarehouse_code_spark.operators.corpus import pack_sequences

    spark = _spark_handle(c)
    budget = 97
    rows = [(f"s{shard}", i, tok) for i, (shard, tok) in enumerate(docs)]
    df = spark.createDataFrame(rows, "src string, doc_id long, n int")
    got = {
        r.doc_id: r for r in pack_sequences(df, budget, "src", "doc_id", "n").collect()
    }
    by_shard: dict = {}
    for shard, i, tok in sorted(rows, key=lambda t: t[1]):
        off = by_shard.get(shard, 0)
        r = got[i]
        assert r.token_offset == off
        assert r.seq_first == off // budget
        assert r.seq_last == (off + tok - 1) // budget
        assert r.seq_first <= r.seq_last
        by_shard[shard] = off + tok


@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 20), st.sampled_from("IUD")),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_cdc_latest_matches_python_replay(changes):
    """cdc_latest == a literal Python replay of the log: keep the
    max-seq change per key, drop keys whose survivor is a delete.
    Duplicate (key, seq) survivors are regenerated away (the operator
    raises on them — covered in test_cleaning_cdc)."""
    import tests.conftest as c

    from datawarehouse_code_spark.operators.cdc import cdc_latest

    spark = _spark_handle(c)
    # dedupe (key, seq) pairs so the tie guard doesn't fire
    seen = set()
    rows = []
    for i, (k, seq, op) in enumerate(changes):
        if (k, seq) in seen:
            continue
        seen.add((k, seq))
        rows.append((k, float(i), op, seq))
    df = spark.createDataFrame(rows, "k long, payload double, op string, seq int")
    got = {(r.k, r.payload, r.seq) for r in cdc_latest(df, ["k"], "seq").collect()}

    best: dict = {}
    for k, payload, op, seq in rows:
        if k not in best or seq > best[k][2]:
            best[k] = (payload, op, seq)
    want = {
        (k, payload, seq)
        for k, (payload, op, seq) in best.items()
        if op != "D"
    }
    assert got == want


# interleave PII-shaped fragments with arbitrary filler: plain
# st.text() essentially never draws an email/IP/phone, which would
# make the assertions vacuous on every example
_PII_FRAGMENTS = st.sampled_from([
    "a@b.cc", "first.last+tag@mail.example.org", "1.2.3.4",
    "10.255.0.99", "555-123-4567", "555 1234 0000", "12.34", "a@b",
    "999.999.999.999", "x 555-12-3456 y",
])
_PII_TEXT = st.lists(
    st.one_of(_PII_FRAGMENTS, st.text(max_size=12)), max_size=12
).map(" ".join)


@given(_PII_TEXT)
@settings(max_examples=30, deadline=None)
def test_redact_pii_leaves_no_matches(text):
    """After redaction, no PII pattern matches the rewritten text, and
    the pre-redaction counts equal Python re counts of the original —
    over text seeded with real and near-miss PII fragments."""
    import re as _re

    import tests.conftest as c

    from datawarehouse_code_spark.operators.text import PII_PATTERNS, redact_pii

    spark = _spark_handle(c)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    # re.ASCII pins Python's \d/\b to the ASCII semantics Java regex
    # and RE2 use (unicode digits would otherwise diverge)
    for name, (pat, _tok) in PII_PATTERNS.items():
        assert getattr(r, f"n_{name}") == len(_re.findall(pat, text, flags=_re.ASCII))
    for _name, (pat, _tok) in PII_PATTERNS.items():
        assert not _re.search(pat, r.redacted_text, flags=_re.ASCII), (pat, r.redacted_text)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),           # user
            st.integers(0, 50),          # ts seconds
            st.sampled_from(["a", "b", "c", "x"]),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(3, 20),                  # horizon seconds
)
@settings(max_examples=20, deadline=None)
def test_funnel_horizon_matches_bruteforce(events, horizon_s):
    """funnel_counts_horizon vs a brute-force per-entry replay in
    Python: for every random event set and horizon, the per-step user
    counts and credited-entry lag sums agree exactly."""
    import tests.conftest as c

    spark = _spark_handle(c)
    from datawarehouse_code_spark.operators.sessions import (
        funnel_counts_horizon,
    )

    steps = ["a", "b", "c"]
    rows = [
        (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), t)
        for u, s, t in events
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {
        r["step"]: (r["n_users"], r["sum_lag_us"])
        for r in funnel_counts_horizon(
            df, steps, f"{horizon_s} seconds"
        ).collect()
    }

    # brute force: per user, for each entry replay greedily within
    # [entry, entry + horizon]; credit the deepest attempt, earliest
    # entry on ties
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, s, t in events:
        if t in steps:
            per_user[u].append((s, steps.index(t) + 1))
    want_counts = defaultdict(int)
    want_lags = defaultdict(int)
    for u, evs in per_user.items():
        evs.sort()
        best = []
        for i, (es, idx) in enumerate(evs):
            if idx != 1:
                continue
            acc = [es]
            for s, j in evs:
                if (
                    j == len(acc) + 1
                    and s > acc[-1]
                    and s <= es + horizon_s
                ):
                    acc.append(s)
            if len(acc) > len(best):
                best = acc
        if best:
            for step_i, s in enumerate(best, start=1):
                want_counts[step_i] += 1
                want_lags[step_i] += (s - best[0]) * 1_000_000
    want = {
        k: (want_counts[k], want_lags[k]) for k in want_counts
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 30), st.integers(0, 9)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(max_examples=15, deadline=None)
def test_gap_fill_properties(buckets):
    """gap_fill invariants under random bucket sets: output is a
    complete per-key day grid, observed rows keep their values,
    constant-filled gaps are 0, and ffill always equals the most
    recent observed value."""
    import tests.conftest as c

    spark = _spark_handle(c)
    from datawarehouse_code_spark.operators.timeseries import gap_fill

    rows = [
        (str(k), datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d),
         float(v))
        for k, d, v in buckets
    ]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    df = df.withColumn("w", F.col("v"))
    out = gap_fill(df, ["k"], "bucket", "1 day", {"v": 0.0, "w": "ffill"})
    got = sorted(
        (r["k"], r["bucket"], r["v"], r["w"]) for r in out.collect()
    )

    from collections import defaultdict

    obs = defaultdict(dict)
    for k, d, v in buckets:
        obs[str(k)][d] = float(v)
    want = []
    for k, dv in obs.items():
        days = sorted(dv)
        last = None
        for d in range(days[0], days[-1] + 1):
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
            if d in dv:
                last = dv[d]
                want.append((k, ts, dv[d], last))
            else:
                want.append((k, ts, 0.0, last))
    assert got == sorted(want)


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
        min_size=2,
        max_size=8,
    ),
    st.integers(2, 3),  # k
)
@settings(max_examples=20, deadline=None)
def test_duplicate_spans_match_python_reference(word_lists, k):
    """duplicate_spans vs a direct Python recomputation: same flagged
    positions merged into the same maximal spans for every random
    tiny corpus (small alphabet forces heavy cross-doc gram overlap,
    the hard case for the island merge)."""
    import tests.conftest as c

    spark = _spark_handle(c)
    from collections import defaultdict

    from datawarehouse_code_spark.operators.text import duplicate_spans

    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_spans(df, k=k, min_docs=2).collect()
    )

    # reference: gram -> set of docs; flagged positions; island merge
    gram_docs = defaultdict(set)
    doc_grams = {}
    for i, ws in enumerate(word_lists):
        grams = [
            (p + 1, " ".join(ws[p : p + k]))
            for p in range(len(ws) - k + 1)
        ]
        doc_grams[i] = grams
        for _pos, g in grams:
            gram_docs[g].add(i)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = []
    for i, grams in doc_grams.items():
        flagged = sorted(p for p, g in grams if g in dup)
        if not flagged:
            continue
        start = prev = flagged[0]
        n = 1
        for p in flagged[1:]:
            if p > prev + k:
                want.append((i, start, prev + k - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        want.append((i, start, prev + k - 1, n))
    assert got == sorted(want)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1, max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=0, max_size=25,
    ),
    st.one_of(st.none(), st.integers(1, 20)),   # tolerance seconds
)
@settings(max_examples=15, deadline=None)
def test_asof_forward_and_nearest_match_pandas(left_rows, right_rows, tol_s):
    """asof_join_forward and asof_join_nearest agree with pandas
    merge_asof (direction=forward/nearest, optional tolerance) on
    arbitrary key/ts data — including pandas' equidistant-resolves-
    backward rule.  Right (key, ts) deduped for unambiguous matches."""
    import pandas as pd

    import tests.conftest as c
    from datawarehouse_code_spark.operators.joins import (
        asof_join_forward,
        asof_join_nearest,
    )

    spark = _spark_handle(c)
    seen = set()
    right_uniq = []
    for i, (k, ts) in enumerate(right_rows):
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_uniq.append((k, ts, i))
    left = spark.createDataFrame(
        [
            (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts), i)
            for i, (k, ts) in enumerate(left_rows)
        ],
        "k int, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts), rid)
            for k, ts, rid in right_uniq
        ] or [(99, datetime.datetime(2024, 1, 1), 0)],
        "k int, ts timestamp, rid int",
    )
    if not right_uniq:
        right = right.filter("k < 0")

    lpdf = pd.DataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left_rows)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rpdf = pd.DataFrame(right_uniq, columns=["k", "ts", "rid"]).sort_values(
        "ts", kind="stable"
    )

    def pandas_want(direction, tolerance):
        if rpdf.empty:
            return {int(lid): None for lid in lpdf["lid"]}
        merged = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k", direction=direction,
            allow_exact_matches=True, tolerance=tolerance,
        )
        return {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }

    got_f = {
        r["lid"]: r["asof_rid"]
        for r in asof_join_forward(
            left, right, ["k"], "ts", ["rid"], right_tiebreak="rid"
        ).collect()
    }
    assert got_f == pandas_want("forward", None)

    tol = None if tol_s is None else f"{tol_s} seconds"
    got_n = {
        r["lid"]: r["asof_rid"]
        for r in asof_join_nearest(
            left, right, ["k"], "ts", ["rid"],
            right_tiebreak="rid", tolerance=tol,
        ).collect()
    }
    want_n = pandas_want("nearest", None if tol_s is None else tol_s)
    assert got_n == want_n


@given(
    st.lists(
        st.lists(st.integers(-1000, 1000), min_size=8, max_size=8),
        min_size=3, max_size=12, unique_by=tuple,
    )
)
@settings(max_examples=10, deadline=None)
def test_quantized_rerank_full_window_equals_bruteforce(vec_rows):
    """Int8 quantized-rank + exact-rerank with a rerank window that
    covers the whole corpus MUST equal brute force exactly for ANY
    vector set — quantization may only reorder the shortlist cut, and
    an all-corpus window makes the cut a no-op.  Catches scale/
    rounding bugs the fixture's well-behaved vectors might mask
    (zero vectors, constant vectors, sign-flips)."""
    import tests.conftest as c
    from datawarehouse_code_spark.operators.similarity import (
        brute_force_topk,
        quantized_rerank_topk,
    )

    spark = _spark_handle(c)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vec_rows)],
        "vec_id bigint, embedding array<float>",
    )
    brute = sorted(map(tuple, brute_force_topk(emb, k=3).collect()))
    quant = sorted(
        map(
            tuple,
            quantized_rerank_topk(
                emb, k=3, rerank_factor=len(vec_rows) + 1
            ).collect(),
        )
    )
    assert brute == quant


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "FOOT", ""]),
            min_size=1, max_size=5,
        ),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_remove_frequent_lines_properties(doc_lines):
    """Two invariants for ANY corpus: (a) max_df >= n_docs is the
    identity (nothing can exceed it); (b) output reassembly agrees
    with a pure-Python replay of the rule."""
    import tests.conftest as c
    from datawarehouse_code_spark.operators.text import remove_frequent_lines

    spark = _spark_handle(c)
    docs = [(i, "\n".join(ls)) for i, ls in enumerate(doc_lines)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    ident = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed_lines"])
        for r in remove_frequent_lines(df, max_df=len(docs)).collect()
    }
    assert ident == {i: (t, 0) for i, t in docs}

    # python replay at max_df=1
    line_docs: dict[str, set] = {}
    for i, t in docs:
        for ln in set(t.split("\n")):
            if ln != "":
                line_docs.setdefault(ln, set()).add(i)
    want = {}
    for i, t in docs:
        kept = [
            ln for ln in t.split("\n")
            if ln == "" or len(line_docs[ln]) <= 1
        ]
        want[i] = ("\n".join(kept), len(t.split("\n")) - len(kept))
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed_lines"])
        for r in remove_frequent_lines(df, max_df=1).collect()
    }
    assert got == want


@given(
    st.integers(1, 6),          # depth
    st.integers(1, 40),         # width
    st.integers(1, 4),          # number of partial sketches
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_cms_codec_and_merge_properties(depth, width, n_parts, data):
    """The count-min byte codec and merge, pure-Python (no Spark):
    serialize∘parse is the identity, merging partials sums counters
    and total counts in any order (commutative + associative at the
    BYTE level, since the layout is canonical), and geometry/hash
    mismatches are refused."""
    import numpy as np

    from datawarehouse_code_spark.operators.rollup import (
        _cms_merge_bytes,
        _cms_parse,
        _cms_serialize,
    )

    hash_a = np.array(
        data.draw(st.lists(st.integers(0, 2**31 - 1),
                           min_size=depth, max_size=depth)),
        dtype=np.int64,
    )
    parts = []
    for _ in range(n_parts):
        table = np.array(
            data.draw(st.lists(st.integers(0, 2**40),
                               min_size=depth * width,
                               max_size=depth * width)),
            dtype=np.int64,
        ).reshape(depth, width)
        tc = int(table[0].sum())
        parts.append(_cms_serialize(tc, depth, width, hash_a, table))

    # codec round-trip
    for b in parts:
        tc, d, w, h, t = _cms_parse(b)
        assert _cms_serialize(tc, d, w, h, t) == b

    merged = _cms_merge_bytes(parts)
    tc_m, d, w, h, t_m = _cms_parse(merged)
    assert d == depth and w == width and (h == hash_a).all()
    assert tc_m == sum(_cms_parse(b)[0] for b in parts)
    assert (t_m == sum(_cms_parse(b)[4] for b in parts)).all()
    # order-independence at the byte level
    assert _cms_merge_bytes(list(reversed(parts))) == merged
    if n_parts >= 3:
        left = _cms_merge_bytes([_cms_merge_bytes(parts[:2]), *parts[2:]])
        assert left == merged

    # refused merges: different geometry / different hash rows
    import pytest

    other = _cms_serialize(
        1, depth, width + 1, hash_a,
        np.zeros((depth, width + 1), dtype=np.int64),
    )
    with pytest.raises(ValueError, match="different"):
        _cms_merge_bytes([parts[0], other])
    bumped = _cms_serialize(
        1, depth, width, hash_a + 1, np.zeros((depth, width), dtype=np.int64)
    )
    with pytest.raises(ValueError, match="different"):
        _cms_merge_bytes([parts[0], bumped])


@settings(max_examples=30, deadline=None)
@given(
    sr=st.integers(1, 192000),
    n_ch=st.integers(1, 4),
    n_frames=st.integers(1, 64),
    bits=st.sampled_from([8, 16]),
    data=st.data(),
)
def test_wav_roundtrip_property(sr, n_ch, n_frames, bits, data):
    """encode_pcm_wav -> decode_audio is bit-exact for ANY sample
    content, width, channel count and rate — including extreme
    values, and the centered-8-bit convention (v - 128)."""
    from datawarehouse_code_spark.operators.multimodal import (
        decode_audio,
        encode_pcm_wav,
    )

    lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
    channels = [
        data.draw(
            st.lists(st.integers(lo, hi), min_size=n_frames,
                     max_size=n_frames)
        )
        for _ in range(n_ch)
    ]
    r, nc, nf, arr = decode_audio(encode_pcm_wav(sr, channels, bits=bits))
    assert (r, nc, nf) == (sr, n_ch, n_frames)
    for c in range(n_ch):
        want = channels[c] if bits == 16 else [v - 128 for v in channels[c]]
        assert arr[:, c].tolist() == want
