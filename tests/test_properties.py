"""Property-based tests (SURVEY.md §5 item 3): bucketing ladders, null
normalizer, timestamp round-trip. Each property evaluates a whole generated
batch in one Spark job against an independent Python twin."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.functions.buckets import (
    bw_group,
    gest_group,
    temp_thermia,
)
from neotree_data_pipeline_kedro_spark.functions.nulls import NULL_TOKENS, nullify
from neotree_data_pipeline_kedro_spark.functions.timestamps import (
    parse_timestamp_multi,
)

SET = settings(max_examples=12, deadline=None)


def _eval(spark, values, expr_fn, in_type="double"):
    pdf = pd.DataFrame({"i": range(len(values)), "x": values})
    df = spark.createDataFrame(pdf, f"i long, x {in_type}")
    rows = df.select("i", expr_fn(F.col("x")).alias("y")).orderBy("i").collect()
    return [r["y"] for r in rows]


# --- python twins (written from the reference's .loc cascade directly,
# --- create_derived_columns.py:34-57 / 61-86 / 152-182) ---------------------

def _py_gest_zim(g):
    if g is None:
        return "Unknowwn"
    if g < 28:
        return "<28"
    if g < 33:
        return "28-32 wks"
    if g < 37:
        return "33-36 wks"
    if g < 42:
        return "37-41 wks"
    return "42 wks or above"


def _py_bw(w):
    if w is None:
        return "Unknown"
    if w < 1000:
        return "ELBW"
    if w < 1500:
        return "VLBW"
    if w < 2500:
        return "LBW"
    if w < 4000:
        return "NBW"
    return "HBW"


def _py_thermia_zim(t):
    if t is None:
        return "Unknown"
    if t <= 32.0:
        return "Severe Hypothermia"
    if 32.1 <= t <= 35.9:
        return "Moderate Hypothermia"
    if 36.0 <= t <= 36.4:
        return "Mild Hypothermia"
    if 36.5 <= t <= 37.5:
        return "Normothermia"
    if t > 37.5:
        return "Fever"
    return None  # the reference's interval gaps fall through


nums = st.lists(
    st.one_of(st.none(), st.floats(min_value=0, max_value=60, allow_nan=False)),
    min_size=1,
    max_size=50,
)
grams = st.lists(
    st.one_of(st.none(), st.floats(min_value=0, max_value=6000, allow_nan=False)),
    min_size=1,
    max_size=50,
)
temps = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=28, max_value=42, allow_nan=False),
        # hammer the gap intervals the reference leaves unlabelled
        st.floats(min_value=32.0, max_value=32.1, allow_nan=False),
        st.floats(min_value=35.9, max_value=36.0, allow_nan=False),
        st.floats(min_value=36.4, max_value=36.5, allow_nan=False),
    ),
    min_size=1,
    max_size=50,
)


@SET
@given(values=nums)
def test_gest_group_matches_twin(spark, values):
    assert _eval(spark, values, gest_group) == [_py_gest_zim(v) for v in values]


@SET
@given(values=grams)
def test_bw_group_matches_twin(spark, values):
    assert _eval(spark, values, bw_group) == [_py_bw(v) for v in values]


@SET
@given(values=temps)
def test_temp_thermia_matches_twin(spark, values):
    assert _eval(spark, values, temp_thermia) == [
        _py_thermia_zim(v) for v in values
    ]


# --- null normalizer --------------------------------------------------------

tokens = st.sampled_from(list(NULL_TOKENS) + ["NaT", "None", "NULL", "<NA>"])
# ASCII space only: trim() in Spark, Postgres, and DuckDB strips spaces, not
# tabs — the engine follows the SQL contract (the reference's pandas
# .str.strip() would also eat tabs, a knowing divergence)
paddings = st.text(alphabet=" ", max_size=3)


@SET
@given(
    values=st.lists(
        st.one_of(
            st.builds(
                lambda t, l, r, up: l + (t.upper() if up else t) + r,
                tokens,
                paddings,
                paddings,
                st.booleans(),
            ),
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1,
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_nullify_property(spark, values):
    got = _eval(spark, values, nullify, in_type="string")
    for raw, out in zip(values, got):
        if raw.strip().lower() in NULL_TOKENS:
            assert out is None, raw
        else:
            assert out == raw.strip(), raw


# --- timestamp round-trip ---------------------------------------------------

FMTS = [
    "%Y-%m-%d %H:%M:%S",
    "%Y/%m/%d",
    "%d %B %Y",
    "%m/%d/%Y",
    "%d.%m.%Y",
    "%Y%m%d",
    "%Y-%m-%dT%H:%M:%S",
]


@SET
@given(
    pairs=st.lists(
        st.tuples(
            st.datetimes(
                min_value=dt.datetime(1990, 1, 1),
                max_value=dt.datetime(2035, 12, 31),
            ).map(lambda d: d.replace(microsecond=0)),
            st.sampled_from(FMTS),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_timestamp_roundtrip(spark, pairs):
    strings, expected = [], []
    for d, fmt in pairs:
        strings.append(d.strftime(fmt))
        expected.append(
            d if ("%H" in fmt) else d.replace(hour=0, minute=0, second=0)
        )
    got = _eval(spark, strings, parse_timestamp_multi, in_type="string")
    # US-before-EU ambiguity: %d.%m.%Y and %m/%d/%Y inputs where both parts
    # are <= 12 legitimately swap — the reference's branch order decides, so
    # the property only demands a successful parse of the same DATE DIGITS
    for (d, fmt), s, out in zip(pairs, strings, got):
        assert out is not None, f"{s} ({fmt}) failed to parse"
        if fmt in ("%m/%d/%Y", "%d.%m.%Y") and d.day <= 12 and d.month != d.day:
            assert {out.month, out.day} == {d.month, d.day}, (s, fmt, out)
        else:
            exp = d if "%H" in fmt else d.replace(hour=0, minute=0, second=0)
            assert out == exp, (s, fmt, out)


# --- text-analysis properties (functions/text.py additions) -----------------

_TEXT_ALPHABET = st.text(
    alphabet=" abcdefghijk.,!?@+0123456789\n-",
    min_size=0,
    max_size=120,
)


@SET
@given(texts=st.lists(_TEXT_ALPHABET, min_size=1, max_size=25))
def test_scrub_pii_idempotent_and_clean(spark, texts):
    """Scrubbing twice equals scrubbing once, and a scrubbed text contains
    no remaining PII matches (placeholders cannot re-trigger patterns)."""
    import re

    from neotree_data_pipeline_kedro_spark.functions.text import (
        PII_EMAIL_RX,
        PII_IP_RX,
        PII_PHONE_RX,
        scrub_pii,
    )

    once = _eval(spark, texts, scrub_pii, in_type="string")
    twice = _eval(spark, once, scrub_pii, in_type="string")
    assert once == twice
    for s in once:
        assert not re.search(PII_EMAIL_RX, s), s
        assert not re.search(PII_IP_RX, s), s
        assert not re.search(PII_PHONE_RX, s), s


@SET
@given(texts=st.lists(_TEXT_ALPHABET, min_size=1, max_size=25))
def test_repetition_fractions_bounded_and_exact(spark, texts):
    """Both repetition fractions stay in [0, 1] and equal a direct Python
    recomputation over the same whitespace tokenization."""
    from neotree_data_pipeline_kedro_spark.functions.text import (
        repetition_components,
    )

    def expr(c):
        comp = repetition_components(c)
        return F.struct(
            comp["n_tokens"].alias("n"),
            comp["dup_token_frac"].alias("dt"),
            comp["dup_bigram_frac"].alias("db"),
        )

    got = _eval(spark, texts, expr, in_type="string")
    for s, row in zip(texts, got):
        toks = s.split() if s.strip() else []
        n = len(toks)
        assert row["n"] == n
        dt_ = 1.0 - len(set(toks)) / n if n else 0.0
        bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
        db_ = 1.0 - len(set(bigrams)) / (n - 1) if n >= 2 else 0.0
        assert row["dt"] == pytest.approx(dt_, abs=1e-12)
        assert row["db"] == pytest.approx(db_, abs=1e-12)
        assert 0.0 <= row["dt"] <= 1.0 and 0.0 <= row["db"] <= 1.0


@SET
@given(texts=st.lists(_TEXT_ALPHABET, min_size=1, max_size=20))
def test_chunking_covers_exactly(spark, texts):
    """Non-overlapping chunks concatenate back to the tokenized text;
    empty/whitespace-only docs yield zero chunks; every chunk except the
    last has exactly `size` tokens."""
    from neotree_data_pipeline_kedro_spark.functions.text import chunk_tokens

    def expr(c):
        return chunk_tokens(c, size=5, overlap=0)

    got = _eval(spark, texts, expr, in_type="string")
    for s, chunks in zip(texts, got):
        toks = s.split()
        if not toks:
            assert chunks == []
            continue
        rebuilt = " ".join(c["chunk_text"] for c in chunks).split()
        assert rebuilt == toks
        for c in chunks[:-1]:
            assert len(c["chunk_text"].split()) == 5
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_chunking_rejects_bad_overlap(spark):
    import pytest as _pytest

    from neotree_data_pipeline_kedro_spark.functions.text import chunk_tokens

    with _pytest.raises(ValueError, match="overlap"):
        chunk_tokens("x", size=5, overlap=5)


# --- range join: bucket blocking must equal the naive window join on any
# --- generated event set, window, and key spread -----------------------------

_rj_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # key
        st.integers(min_value=0, max_value=72 * 3600),    # seconds offset
    ),
    min_size=0,
    max_size=60,
)
_rj_bounds = st.tuples(
    st.integers(min_value=-12 * 3600, max_value=12 * 3600),
    st.integers(min_value=1, max_value=24 * 3600),
).map(lambda t: (t[0], t[0] + t[1]))  # lower < upper always


@SET
@given(left=_rj_events, right=_rj_events, bounds=_rj_bounds)
def test_range_join_matches_naive_property(spark, left, right, bounds):
    from neotree_data_pipeline_kedro_spark.operators.joins import range_join

    lower_s, upper_s = bounds
    base = dt.datetime(2024, 6, 1)
    ldf = spark.createDataFrame(
        [(i, f"k{k}", base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "lid long, key string, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(i, f"k{k}", base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(right)],
        "rid long, key string, rts timestamp",
    )
    got = {
        (r.lid, r.rid)
        for r in range_join(
            ldf, rdf, ["key"], "lts", "rts",
            lower_s * 1_000_000, upper_s * 1_000_000,
        ).collect()
    }
    want = {
        (li, ri)
        for li, (lk, ls) in enumerate(left)
        for ri, (rk, rs) in enumerate(right)
        if lk == rk and lower_s < (rs - ls) <= upper_s
    }
    assert got == want


def test_split_assign_stable_under_growth(spark):
    """A key's split never changes when the dataset grows — the training
    reproducibility property random splits lack."""
    from neotree_data_pipeline_kedro_spark.operators.sampling import split_assign

    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    small = spark.range(0, 500)
    big = spark.range(0, 5000)
    s = {r.id: r.split for r in split_assign(small, "id", splits).collect()}
    b = {r.id: r.split for r in split_assign(big, "id", splits).collect()}
    assert all(b[k] == v for k, v in s.items())
    # fractions land near the targets (md5 uniformity)
    from collections import Counter

    frac = Counter(b.values())
    assert abs(frac["train"] / 5000 - 0.8) < 0.03
    assert abs(frac["val"] / 5000 - 0.1) < 0.02
    assert abs(frac["test"] / 5000 - 0.1) < 0.02


def test_priority_sample_weights_bias_and_determinism(spark):
    from neotree_data_pipeline_kedro_spark.operators.sampling import (
        priority_sample,
    )

    # two strata of equal size: heavy rows weigh 50x light rows
    rows = [(i, 50 if i % 2 == 0 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = priority_sample(df, "id", "w", k=200).collect()
    heavy = sum(1 for r in out if r.w == 50)
    # PPS-ish: heavy rows should dominate the sample decisively
    assert heavy > 150, f"only {heavy}/200 heavy rows sampled"
    # deterministic: a repartitioned rerun picks the identical set
    again = priority_sample(df.repartition(13), "id", "w", k=200).collect()
    assert {r.id for r in out} == {r.id for r in again}


def test_priority_sample_per_group(spark):
    from neotree_data_pipeline_kedro_spark.operators.sampling import (
        priority_sample,
    )

    rows = [(g, i, 1) for g in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = priority_sample(df, "id", "w", k=5, group_cols=["g"]).collect()
    from collections import Counter

    assert Counter(r.g for r in out) == {"a": 5, "b": 5}


# --- PPJoin: exactness + filter-stack pruning (SURVEY §2.12 dedup) ---------

@given(
    st.one_of(
        # small vocab (<=61 distinct): exercises the <=63-bit bitset path
        st.lists(
            st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=25),
            min_size=2,
            max_size=18,
        ),
        # wide vocab (up to 200 distinct): forces the array + PPJoin+
        # suffix-filter path, so its upper-bound-only pruning is fuzzed too
        st.lists(
            st.lists(st.integers(min_value=0, max_value=199), min_size=1, max_size=25),
            min_size=4,
            max_size=18,
        ),
    )
)
@settings(max_examples=14, deadline=None)
@pytest.mark.slow  # r13: heavy tail, builder-run via -m slow
def test_ppjoin_property_matches_bruteforce(spark, sets):
    """set_similarity_join output == brute-force O(n^2) Jaccard twin on
    arbitrary generated set families (dup members, shared hot tokens,
    subset/superset pairs). The two strategies pin BOTH execution paths:
    <=63 distinct members rides the exact-bitset fast path, the wide
    strategy forces the sorted-array + suffix-filter path — so the
    suffix filter's exactness (upper-bound-only pruning) is fuzzed
    property-wide, not just at the crafted adversarial pair below."""
    from neotree_data_pipeline_kedro_spark.operators.neardup import (
        set_similarity_join,
    )

    rows = [(i, [f"w{v}" for v in s]) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "id bigint, s array<string>")
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_n)
        for r in set_similarity_join(df, "id", "s", tau_num=6, tau_den=10).collect()
    }
    want = {}
    dedup = [set(s) for s in (r[1] for r in rows)]
    for i in range(len(dedup)):
        for j in range(i + 1, len(dedup)):
            a, b = dedup[i], dedup[j]
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if inter * 10 >= 6 * union:
                want[(i, j)] = (inter, union)
    assert got == want


def test_ppjoin_suffix_filter_prunes_before_intersect(spark):
    """PPJoin+ suffix filter: a candidate pair that survives the length,
    prefix, and positional filters but whose suffix ranges cannot overlap
    enough must be dropped BEFORE the exact intersection. Construct it
    directly: big-vocab corpus (bitset path off), two sets sharing ONE
    early rare token, with a's suffix entirely below b's suffix in the
    frequency order except too few crossers — positional bound passes
    (cnt + min suffix sizes >= alpha) while the pivot-partition bound
    fails. The pair must not reach the verify intersection (asserted on
    the physical row count through the filter), and the output must be
    unchanged (it was never a true match)."""
    from neotree_data_pipeline_kedro_spark.operators.neardup import (
        set_similarity_join,
    )

    # Frequencies are engineered so the shared token is the RAREST
    # (freq 2 -> prefix position 1 in both sets) while a's other members
    # (freq 3, via two filler carriers each) all sort below b's (freq 4,
    # via three carriers): tau=8/10, |a|=|b|=10 -> prefix p=3,
    # alpha = ceil(8*20/18) = 9; positional bound = 1 + min(9,9) = 10
    # >= 9 (survives), but the pivot probe on b's suffix median sees all
    # nine a-suffix members below it: bound = 1 + min(9,4) + min(0,5)
    # = 5 < 9 -> pruned before the intersection. Filler docs pairwise
    # share at most one token (jaccard 1/5), and the vocabulary is ~109
    # tokens so the array+suffix path (not the <=63-bit bitset) runs.
    a_members = ["shared"] + [f"a{k}" for k in range(9)]
    b_members = ["shared"] + [f"b{k}" for k in range(9)]
    filler = []
    for k in range(9):
        filler.append((100 + k, [f"a{k}", f"xa{k}", f"ya{k}"]))
        filler.append((200 + k, [f"a{k}", f"xc{k}", f"yc{k}"]))
        filler.append((300 + k, [f"b{k}", f"xb{k}", f"yb{k}"]))
        filler.append((400 + k, [f"b{k}", f"xd{k}", f"yd{k}"]))
        filler.append((500 + k, [f"b{k}", f"xe{k}", f"ye{k}"]))
    rows = [(1, a_members), (2, b_members)] + filler
    df = spark.createDataFrame(rows, "id bigint, s array<string>")
    out = set_similarity_join(df, "id", "s", tau_num=8, tau_den=10).collect()
    assert out == []  # no true matches, and no crash on the pruned pair

    # prove the SUFFIX filter (not the exact intersect) is what kills the
    # pair: (1) it survives length+prefix+positional filtering into the
    # candidate set, (2) the operator's one-probe bound — replayed here
    # in Python on the same (freq, token)-sorted arrays — misses alpha.
    from collections import Counter

    from neotree_data_pipeline_kedro_spark.operators.neardup import (
        _ppjoin_candidates,
    )

    freq = Counter()
    for _, s in rows:
        freq.update(set(s))
    order = {t: (freq[t], t) for t in freq}
    sa = sorted(set(a_members), key=order.get)
    sb = sorted(set(b_members), key=order.get)
    enc = spark.createDataFrame(
        [
            (i, ["%013d\x01%s" % (freq[t], t) for t in s], len(set(s)))
            for i, s in ((1, sa), (2, sb))
        ],
        "__id bigint, __s array<string>, __n int",
    )
    cand = {
        (r["__ida"], r["__idb"], r["__cnt"], r["__pamax"], r["__pbmax"])
        for r in _ppjoin_candidates(enc, 8, 10).collect()
    }
    assert len(cand) == 1  # survived every pre-suffix filter
    (_, _, cnt, pamax, pbmax) = next(iter(cand))
    suf_a, suf_b = sa[pamax:], sb[pbmax:]
    hb = (len(suf_b) + 1) // 2
    pivot = order[suf_b[hb - 1]]
    la = sum(1 for t in suf_a if order[t] < pivot)
    lb, ra, rb = hb - 1, len(suf_a) - la, len(suf_b) - (hb - 1)
    alpha = -(-8 * (len(sa) + len(sb)) // (8 + 10))
    assert cnt + min(la, lb) + min(ra, rb) < alpha  # suffix bound prunes
