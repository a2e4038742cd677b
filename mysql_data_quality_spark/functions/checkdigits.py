"""Vectorized Brazilian document check-digit validation (CPF / CNPJ).

Same semantics as the reference's per-value Python validators
(``/root/reference/src/data_quality/validators/patterns.py:298-364``:
strip non-digits, length check, all-same-digit rejection, two mod-11
weighted check digits) — re-expressed as numpy batch math inside Arrow
pandas UDFs: the canonical "custom validator" extension point
(patterns.py:221-224) without per-row Python in the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_CNPJ_W1 = np.array([5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2])
_CNPJ_W2 = np.array([6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2])
_CPF_W1 = np.arange(10, 1, -1)
_CPF_W2 = np.arange(11, 1, -1)


def _digit_matrix(values: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Strip formatting; return (mask of length-n all-digit values,
    int matrix of their digits)."""
    stripped = values.fillna("").astype(str).str.replace(r"[^\d]", "", regex=True)
    ok = stripped.str.len() == n
    digits = np.zeros((len(values), n), dtype=np.int64)
    if ok.any():
        arr = (
            stripped[ok]
            .apply(lambda s: [int(c) for c in s])
            .tolist()
        )
        digits[np.asarray(ok)] = np.array(arr, dtype=np.int64)
    return np.asarray(ok), digits


def _mod11_digit(digits: np.ndarray, weights: np.ndarray) -> np.ndarray:
    total = digits @ weights
    rem = total % 11
    return np.where(rem < 2, 0, 11 - rem)


def cpf_valid_batch(values: pd.Series) -> pd.Series:
    ok, d = _digit_matrix(values, 11)
    not_same = ~(d == d[:, [0]]).all(axis=1)
    d1 = _mod11_digit(d[:, :9], _CPF_W1) == d[:, 9]
    d2 = _mod11_digit(d[:, :10], _CPF_W2) == d[:, 10]
    return pd.Series(ok & not_same & d1 & d2, dtype="bool")


def cnpj_valid_batch(values: pd.Series) -> pd.Series:
    ok, d = _digit_matrix(values, 14)
    not_same = ~(d == d[:, [0]]).all(axis=1)
    d1 = _mod11_digit(d[:, :12], _CNPJ_W1) == d[:, 12]
    d2 = _mod11_digit(d[:, :13], _CNPJ_W2) == d[:, 13]
    return pd.Series(ok & not_same & d1 & d2, dtype="bool")


def cpf_valid_udf() -> Column:
    return pandas_udf(cpf_valid_batch, "boolean")


def cnpj_valid_udf() -> Column:
    return pandas_udf(cnpj_valid_batch, "boolean")


# ---------------------------------------------------------------------------
# Luhn (ISO/IEC 7812) — payment-card numbers.  Same extension-point shape
# as the mod-11 validators above: numpy batch math inside an Arrow UDF,
# variable length 13-19 digits.
# ---------------------------------------------------------------------------
def luhn_ok(digits: str) -> bool:
    """Scalar Luhn validity — THE canonical rule definition (13-19
    digits, checksum, all-same-digit rejected).  The vectorized
    :func:`luhn_valid_batch` reimplements it as column math for the UDF
    hot path (parity-pinned by tests); the per-match card scrubber
    (``rules/pii.py``) calls this directly so detection and scrubbing
    can never drift."""
    if not (13 <= len(digits) <= 19) or len(set(digits)) == 1:
        return False
    total = 0
    for i, c in enumerate(reversed(digits)):
        d = int(c)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def luhn_valid_batch(values: pd.Series) -> pd.Series:
    """True where the value (after stripping spaces/dashes/dots) is
    13-19 digits passing the Luhn checksum; all-same-digit rejected
    (0000... passes Luhn but is never a real PAN)."""
    stripped = values.fillna("").astype(str).str.replace(
        r"[^\d]", "", regex=True
    )
    lens = stripped.str.len().to_numpy()
    ok = (lens >= 13) & (lens <= 19)
    out = np.zeros(len(values), dtype=bool)
    if ok.any():
        # right-align into a fixed 19-wide digit matrix so doubling
        # positions (every second from the right) are column-constant
        padded = stripped[ok].str.rjust(19, "0")
        d = np.array(
            padded.apply(lambda s: [int(c) for c in s]).tolist(),
            dtype=np.int64,
        )
        dbl = d.copy()
        cols = np.arange(19)
        second_from_right = (18 - cols) % 2 == 1
        dbl[:, second_from_right] *= 2
        dbl[dbl > 9] -= 9
        luhn = dbl.sum(axis=1) % 10 == 0
        sub = stripped[ok]
        not_same = ~sub.apply(lambda s: len(set(s)) == 1).to_numpy()
        out[np.asarray(ok)] = luhn & not_same
    return pd.Series(out, dtype="bool")


def luhn_valid_udf() -> Column:
    return pandas_udf(luhn_valid_batch, "boolean")
