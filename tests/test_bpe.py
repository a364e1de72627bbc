"""BPE trainer/encoder (operators/bpe.py) vs a pure-Python reference
implementation of Sennrich-style BPE over the same word-frequency dict.
"""

from __future__ import annotations

from collections import Counter

import pytest

from finanalyzer_spark.operators.bpe import bpe_encode, fit_bpe

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new newer",
]


def _ref_fit(word_freq: dict[str, int], n_merges: int, min_freq: int):
    """Reference trainer: same tie-break (count desc, then pair asc)."""
    seqs = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((a, b, cnt))
        for w, s in seqs.items():
            out = []
            for sym in s:
                if out and out[-1] == a and sym == b:
                    out[-1] = a + b
                else:
                    out.append(sym)
            seqs[w] = out
    return merges


def _ref_encode(word: str, merges):
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_fit_bpe_matches_reference(spark, docs):
    wf: dict[str, int] = Counter(w for t in CORPUS for w in t.split())
    want = _ref_fit(dict(wf), n_merges=12, min_freq=2)
    got = fit_bpe(docs, n_merges=12, min_freq=2, checkpoint_every=3)
    assert got == want
    assert len(got) >= 5  # the corpus genuinely supports merges
    # first merge on this corpus is deterministic and meaningful
    a, b, cnt = got[0]
    assert cnt == max(c for _, _, c in got)


def test_fit_bpe_min_freq_stops(spark, docs):
    everything = fit_bpe(docs, n_merges=100, min_freq=2)
    # asking for more merges cannot invent pairs below the floor
    assert all(c >= 2 for _, _, c in everything)
    again = fit_bpe(docs, n_merges=len(everything) + 50, min_freq=2)
    assert again == everything


def test_bpe_encode_matches_reference(spark, docs):
    merges = fit_bpe(docs, n_merges=10, min_freq=2)
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    for i, text in enumerate(CORPUS):
        want = [t for w in text.split() for t in _ref_encode(w, merges)]
        assert got[i] == want
    # round trip: concatenating tokens per word restores the text
    joined = "".join(got[0])
    assert joined == CORPUS[0].replace(" ", "")


def test_bpe_encode_handles_unseen_words(spark, docs):
    merges = fit_bpe(docs, n_merges=8, min_freq=2)
    other = spark.createDataFrame(
        [(99, "lowest zzz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["tokens"] for r in bpe_encode(other, merges).collect()}
    assert "".join(out[99]) == "lowestzzz"


def test_fit_bpe_property_random_corpora(spark):
    """Trainer == reference implementation over randomized small
    corpora (hypothesis): merge list identical, including tie-breaks."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        words=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5),
            min_size=1,
            max_size=12,
        )
    )
    def run(words):
        text = " ".join(words)
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        wf = Counter(w for w in text.split())
        want = _ref_fit(dict(wf), n_merges=4, min_freq=1)
        got = fit_bpe(docs, n_merges=4, min_freq=1, checkpoint_every=2)
        assert got == want

    run()
