"""Meta-tests of the differential harness itself (tests/oracle_harness):
the registry's whole verification story rests on `compare` actually
FAILING when an answer is wrong. Each test perturbs a correct result in
a way a real bug would (dropped row, shifted value, renamed column,
scrambled key↔value association, sign-flipped zero) and asserts the
check trips — plus the one sub-tolerance case that must pass, pinning
the 1e-6 canonicalization boundary."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_harness import compare


def _spark_frame(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf)


@pytest.fixture()
def base_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": ["a", "b", "c"],
            "n": [1, 2, 3],
            "v": [1.5, 2.25, 3.125],
        }
    )


def test_identical_frames_pass(spark, base_pdf):
    compare(_spark_frame(spark, base_pdf), base_pdf.copy(), "identity")


def test_dropped_row_caught(spark, base_pdf):
    with pytest.raises(AssertionError, match="row count"):
        compare(
            _spark_frame(spark, base_pdf.iloc[:2]), base_pdf, "dropped"
        )


def test_renamed_column_caught(spark, base_pdf):
    bad = base_pdf.rename(columns={"v": "value"})
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(_spark_frame(spark, base_pdf), bad, "renamed")


def test_value_shift_above_tolerance_caught(spark, base_pdf):
    bad = base_pdf.copy()
    bad.loc[1, "v"] += 1e-5
    with pytest.raises(AssertionError, match="value mismatches"):
        compare(_spark_frame(spark, base_pdf), bad, "shifted")


def test_value_shift_below_tolerance_passes(spark, base_pdf):
    """Pins the canonicalization boundary: cross-engine fp formatting
    noise under 1e-6 is absorbed (this is why every oracle keeps its
    arithmetic bit-identical rather than leaning on the tolerance —
    the round-8 tie-class rule)."""
    ok = base_pdf.copy()
    ok.loc[1, "v"] += 1e-8
    compare(_spark_frame(spark, base_pdf), ok, "sub-tolerance")


def test_key_value_reassociation_caught(spark, base_pdf):
    """Swapping two values BETWEEN rows preserves every per-column
    multiset; only whole-row tuples catch it — the property that makes
    the order-insensitive compare association-safe."""
    bad = base_pdf.copy()
    bad.loc[0, "v"], bad.loc[1, "v"] = (
        base_pdf.loc[1, "v"],
        base_pdf.loc[0, "v"],
    )
    with pytest.raises(AssertionError, match="value mismatches"):
        compare(_spark_frame(spark, base_pdf), bad, "reassoc")


def test_signed_zero_not_a_false_mismatch(spark):
    """-0.0 vs 0.0 straddles a rounding boundary in the two engines;
    the canonicalizer collapses them (a false mismatch here would brand
    correct entries wrong)."""
    a = pd.DataFrame({"k": ["x"], "v": [0.0]})
    b = pd.DataFrame({"k": ["x"], "v": [-0.0]})
    compare(_spark_frame(spark, a), b, "signed-zero")


def test_integer_vs_float_type_drift_caught(spark):
    """A BIGINT column coming back as DOUBLE (e.g. a forgotten ::BIGINT
    on a DuckDB sum) must not slip through canonicalization."""
    a = pd.DataFrame({"k": ["x"], "n": [2]})
    b = pd.DataFrame({"k": ["x"], "n": [2.0]})
    with pytest.raises(AssertionError, match="value mismatches"):
        compare(_spark_frame(spark, a), b, "type-drift")


def test_codec_decode_bug_classes_caught(spark):
    """The audio entries' codec-adversarial claim, made concrete: for
    each classic PCM-decode bug class (byte order, signedness, header
    offset/truncation), decoding the SAME WAV container wrongly
    produces features that differ from the closed-form reference for at
    least one doc — i.e. the oracle really can catch a broken codec,
    the check is not vacuously symmetric."""
    import numpy as np

    from numalogic_prometheus_spark.operators.multimodal import (
        _wav_n_samples,
        _wav_samples,
        synthesize_wav,
    )

    doc_ids = [1, 7, 42, 96]  # spans several n-sample classes

    def features(s: np.ndarray) -> tuple:
        s = s.astype(np.int64)
        return (
            int(np.abs(s).sum()),
            int((s * s).sum()),
            int(((s[1:] * s[:-1]) < 0).sum()),
        )

    def reference(doc_id: int) -> tuple:
        return features(_wav_samples(doc_id, _wav_n_samples(doc_id)))

    bug_decoders = {
        # big-endian read of little-endian PCM
        "byteswap": lambda raw: np.frombuffer(raw, dtype=">i2"),
        # unsigned read of signed PCM
        "unsigned": lambda raw: np.frombuffer(raw, dtype="<u2"),
        # off-by-two header offset (drops a byte pair, shifts frames)
        "offset": lambda raw: np.frombuffer(raw[2:], dtype="<i2"),
        # truncated read (half the frames)
        "truncate": lambda raw: np.frombuffer(
            raw[: (len(raw) // 4) * 2], dtype="<i2"
        ),
    }
    for name, decode in bug_decoders.items():
        diverged = False
        for d in doc_ids:
            import io
            import wave

            with wave.open(io.BytesIO(synthesize_wav(d))) as w:
                raw = w.readframes(w.getnframes())
            if features(decode(raw)) != reference(d):
                diverged = True
                break
        assert diverged, f"decode bug class {name!r} not detectable"

    # and the CORRECT decode matches the closed form for every doc
    for d in doc_ids:
        import io
        import wave

        with wave.open(io.BytesIO(synthesize_wav(d))) as w:
            raw = w.readframes(w.getnframes())
        assert features(np.frombuffer(raw, dtype="<i2")) == reference(d)
