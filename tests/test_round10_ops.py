"""Unit tests for the round-10 operators — hand-computed fixtures and
degenerate inputs. Cross-engine parity is covered by
tests/test_oracle_parity.py (every registered oracle, sf0.001, every
session).
"""

from __future__ import annotations

import pytest


class TestLmPlausibility:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_laplace(self, spark):
        from kinesis_stream_spark.operators.text import lm_plausibility

        docs = self._docs(
            spark,
            [
                (0, "a b a"),   # train: bigrams "a b", "b a"
                (2, "a b"),     # train: "a b"  -> cb(a b)=2, cb(b a)=1
                (1, "a b c"),   # score
                (3, "z"),       # score, single token -> no row
                (5, "c c"),     # score, fully unseen
            ],
        )
        out = {r.doc_id: r for r in lm_plausibility(docs).collect()}
        assert set(out) == {1, 5}
        # ctx counts: a -> 2, b -> 1; V = {a, b} = 2
        # doc1: "a b": (2+1)*1e6 // (2+2) = 750000 (seen)
        #       "b c": (0+1)*1e6 // (1+2) = 333333 (unseen)
        r1 = out[1]
        assert r1.n_bigrams == 2 and r1.n_unseen == 1
        assert r1.sum_prob_ppm == 750000 + 333333
        assert r1.mean_prob_ppm == (750000 + 333333) / 2.0
        # doc5: "c c": unseen bigram, unseen ctx -> 1e6 // (0+2)
        r5 = out[5]
        assert r5.n_bigrams == 1 and r5.n_unseen == 1
        assert r5.sum_prob_ppm == 500000

    def test_plausible_outranks_soup(self, spark):
        """The filter's point: text walking the training corpus's
        transitions scores above shuffled token soup."""
        from kinesis_stream_spark.operators.text import lm_plausibility

        train = [(i * 2, "the quick fox jumps over the lazy dog") for i in range(8)]
        score = [
            (1, "the quick fox jumps over the lazy dog"),
            (3, "dog the over quick lazy jumps fox the"),
        ]
        out = {
            r.doc_id: r.mean_prob_ppm
            for r in lm_plausibility(self._docs(spark, train + score)).collect()
        }
        assert out[1] > out[3]

    def test_null_text_no_row(self, spark):
        from kinesis_stream_spark.operators.text import lm_plausibility

        docs = self._docs(spark, [(0, "a b"), (1, None)])
        assert lm_plausibility(docs).collect() == []
