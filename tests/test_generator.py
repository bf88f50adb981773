"""Generator determinism + invariants (FIXTURES.md §1)."""

import numpy as np
import pandas as pd

from lindorm_tsdb_contest_java_spark.sources.generator import (
    generate_dups_variant, generate_transcripts,
)


def test_deterministic():
    a = generate_transcripts(n_conv=50, mean_turns=20, seed=42)
    b = generate_transcripts(n_conv=50, mean_turns=20, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = generate_transcripts(n_conv=50, mean_turns=20, seed=7)
    assert not a.equals(c)


def test_invariants(transcripts_pdf):
    df = transcripts_pdf
    assert not df.isna().any().any()
    assert df.duplicated(["conv_id", "turn_idx"]).sum() == 0
    # ts strictly increasing per conv
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert (g.diff().dropna() > pd.Timedelta(0)).all()
    # turn_idx contiguous from 0
    tix = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["turn_idx"]
    assert (tix.first() == 0).all()
    assert (tix.diff().dropna() == 1).all()
    assert df["turn_idx"].dtype == np.int32


def test_skew(transcripts_pdf):
    sizes = transcripts_pdf.groupby("conv_id").size()
    assert sizes.loc["conv-00000000"] >= 40 * sizes.median()


def test_text_shape(transcripts_pdf):
    t = transcripts_pdf["text"]
    assert (t.str.len() == 0).any(), "must include empty strings"
    assert t.str.contains("日本語|токен|多字节").any(), "must include multibyte"


def test_dups_variant(transcripts_pdf):
    dups = generate_dups_variant(transcripts_pdf, frac=0.05)
    n_dup = dups.duplicated(["conv_id", "turn_idx"]).sum()
    assert n_dup > 0
    assert len(dups) == len(transcripts_pdf) + n_dup
