"""ARPA n-gram language models: parse the standard KenLM/SRILM text
format and score documents with full backoff — the "real learned
weights" upgrade path for the perplexity rule.

``rules/perplexity.py`` ships a deterministic unigram stand-in (no model
downloads in this environment, per BASELINE.json); this module makes the
KenLM story concrete without the kenlm C library: KenLM *trains to* and
*interoperates with* the ARPA text format (``\\data\\`` header, per-order
``\\n-grams:`` sections of ``logprob<TAB>ngram[<TAB>backoff]``), which is
plain text — parsing it and applying Katz backoff is pure Python + dict
lookups, Arrow-batched for scoring.

Scoring follows the standard backoff recursion (same semantics KenLM
implements in C):

    p(w | ctx)           = logp(ctx + w)                 if ctx+w listed
                         = backoff(ctx) + p(w | ctx[1:]) otherwise
    p(w | ())            = logp(w)  or  unk_logp for OOV

Determinism: log values come from decimal text (one fixed float64 parse),
token scores accumulate in a fixed sequential order, so a document's
score is bit-identical across partitionings, batch sizes, and cluster
widths — the same invariant the unigram paths pin (north-rule
byte-identity of decisions).

Scale: an ARPA model is driver-side state shipped to executors once per
model (a real KenLM web model is GBs — at that size, persist the parsed
tables and move to ``SparkContext.broadcast``, which this module uses
when given a SparkContext; closure capture otherwise).  Scoring stays
Arrow-batched: no per-row Python, one pandas UDF call per batch.

Reference analogue: the custom-validator hook
(``/root/reference/src/data_quality/validators/patterns.py:221-224``),
batched instead of per-row.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

# log10 -> ln: ARPA stores log10 probabilities; the perplexity rule
# thresholds mean natural-log prob, so convert once at parse time with a
# single multiply (deterministic).
_LN10 = math.log(10.0)

_WS = re.compile(r"[ \t\n\x0B\f\r]+")  # same tokenizer as perplexity.py

_DEFAULT_UNK_LN = -442.0 / 32.0  # perplexity.OOV_LOGP — same OOV floor


@dataclass
class ArpaModel:
    """Parsed ARPA model: per-order ``{ngram tuple: (ln_prob, ln_backoff)}``.

    ``ngrams[k]`` holds the (k+1)-grams.  ``unk_ln`` is used for words
    with no unigram entry when the model itself lists no ``<unk>``.
    """

    ngrams: Tuple[Dict[Tuple[str, ...], Tuple[float, float]], ...]
    unk_ln: float = _DEFAULT_UNK_LN
    lowercase: bool = True
    counts: Tuple[int, ...] = field(default_factory=tuple)

    @property
    def order(self) -> int:
        return len(self.ngrams)

    def logprob(self, word: str, context: Tuple[str, ...]) -> float:
        """ln p(word | context), standard backoff recursion (context is
        truncated to the model order)."""
        ctx = context[-(self.order - 1):] if self.order > 1 else ()
        while True:
            entry = self.ngrams[len(ctx)].get(ctx + (word,))
            if entry is not None:
                return entry[0]
            if not ctx:
                unk = self.ngrams[0].get(("<unk>",))
                return unk[0] if unk is not None else self.unk_ln
            bo = self.ngrams[len(ctx) - 1].get(ctx)
            # carry the backoff weight and retry with the shorter context
            # (iterative: long contexts can't blow the recursion limit);
            # note an ln-backoff accumulates ADDITIVELY per shortening
            backoff = bo[1] if bo is not None else 0.0
            if backoff:
                return backoff + self.logprob(word, ctx[1:])
            ctx = ctx[1:]

    def avg_logprob(self, text: Optional[str]) -> float:
        """Mean ln-prob per token over the document, fixed left-to-right
        accumulation; ``unk_ln`` for an empty document (scores like pure
        noise, matching perplexity.EMPTY_DOC_LOGP semantics)."""
        toks = [t for t in _WS.split(text or "") if t]
        if self.lowercase:
            toks = [t.lower() for t in toks]
        if not toks:
            return self.unk_ln
        total = 0.0
        keep = self.order - 1
        ctx: Tuple[str, ...] = ()
        for t in toks:
            total = total + self.logprob(t, ctx)
            # context stays bounded at order-1 tokens (tuple concat on an
            # unbounded context would cost O(n^2) over a 50k-token doc)
            ctx = (ctx + (t,))[-keep:] if keep > 0 else ()
        return total / float(len(toks))


def parse_arpa(text: str, lowercase: bool = True) -> ArpaModel:
    """Parse ARPA text (the format KenLM's ``lmplz`` emits) into an
    :class:`ArpaModel`.  Validates the ``\\data\\`` header counts against
    the parsed sections; raises ``ValueError`` on malformed input rather
    than silently scoring with a truncated model."""
    lines = iter(text.splitlines())
    counts: list[int] = []
    for raw in lines:
        if raw.strip() == "\\data\\":
            break
    else:
        raise ValueError("ARPA: missing \\data\\ header")
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        m = re.match(r"ngram (\d+)=(\d+)$", line)
        if m:
            order = int(m.group(1))
            if order != len(counts) + 1:
                raise ValueError(f"ARPA: out-of-order count line {line!r}")
            counts.append(int(m.group(2)))
            continue
        if line.startswith("\\") and line.endswith("-grams:"):
            first_section = line
            break
        raise ValueError(f"ARPA: unexpected line in header: {line!r}")
    else:
        raise ValueError("ARPA: no n-gram sections")
    if not counts:
        raise ValueError("ARPA: empty \\data\\ header")

    tables: list[Dict[Tuple[str, ...], Tuple[float, float]]] = [
        {} for _ in counts
    ]
    section = int(first_section[1:].split("-", 1)[0])
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        if line == "\\end\\":
            section = -1
            break
        m = re.match(r"\\(\d+)-grams:$", line)
        if m:
            section = int(m.group(1))
            continue
        parts = line.split("\t")
        if len(parts) < 2:
            parts = line.split()
            if len(parts) < 2:
                raise ValueError(f"ARPA: malformed entry {line!r}")
            parts = [parts[0], " ".join(parts[1:])]
        logp = float(parts[0]) * _LN10
        words = tuple(_WS.split(parts[1].strip()))
        if lowercase:
            words = tuple(
                w.lower() if w not in ("<s>", "</s>", "<unk>") else w
                for w in words
            )
        if len(words) != section:
            raise ValueError(
                f"ARPA: {len(words)}-gram {words!r} in \\{section}-grams:"
            )
        backoff = float(parts[2]) * _LN10 if len(parts) > 2 else 0.0
        tables[section - 1][words] = (logp, backoff)
    if section != -1:
        raise ValueError("ARPA: missing \\end\\")
    for i, (want, table) in enumerate(zip(counts, tables), start=1):
        if len(table) != want:
            raise ValueError(
                f"ARPA: header says ngram {i}={want}, parsed {len(table)}"
            )
    unk = tables[0].get(("<unk>",))
    return ArpaModel(
        ngrams=tuple(tables),
        unk_ln=unk[0] if unk is not None else _DEFAULT_UNK_LN,
        lowercase=lowercase,
        counts=tuple(counts),
    )


def parse_arpa_file(path: str, lowercase: bool = True) -> ArpaModel:
    with open(path, encoding="utf-8") as fh:
        return parse_arpa(fh.read(), lowercase=lowercase)


def avg_logprob_pandas_udf(model: ArpaModel, sc=None) -> Column:
    """Arrow-batched scorer: text -> mean ln-prob per token under the
    ARPA model.  Pass the SparkContext to ship the model via a torrent
    broadcast instead of task-closure capture (right for models beyond a
    few MB; mandatory for real web-scale KenLM models)."""
    bc = sc.broadcast(model) if sc is not None else None

    def batch(texts: pd.Series) -> pd.Series:
        m = bc.value if bc is not None else model
        return pd.Series(
            [m.avg_logprob(t) for t in texts], dtype="float64"
        )

    return pandas_udf(batch, "double")
