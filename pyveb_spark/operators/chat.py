"""Instruction/SFT data preparation: turn-structured conversations to
training text with loss-mask offsets.

Supervised fine-tuning corpora are conversations, not documents: each
example is an ordered list of (role, content) turns rendered through a
chat template, and the loss is masked to the assistant turns only. The
engine-side work is (a) deterministic turn ordering, (b) template
rendering, and (c) CHARACTER-OFFSET bookkeeping for the mask — all pure
window/string expressions, so a 100 TB conversation corpus renders
scan-stage with ONE shuffle (the per-conversation window sort).

No reference analogue (the reference predates LLM data prep); template
shape follows the public chat-markup conventions (role-sentinel + newline,
e.g. the ChatML family).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["render_chat_turns"]


def render_chat_turns(
    df: DataFrame,
    conv_col: str,
    order_cols: Sequence[str],
    role_col: str,
    content_col: str,
    trainable_roles: Sequence[str] = ("assistant",),
) -> DataFrame:
    """Per-turn rendering with loss-mask character offsets.

    Each turn renders as ``<|{role}|>{content}\\n``; ``start_char`` /
    ``end_char`` are the turn's half-open character span in the
    conversation's concatenated rendering, and ``is_trainable`` marks
    turns whose role is in ``trainable_roles`` (the loss mask). Returns
    ``(conv, turn_idx, role, start_char, end_char, is_trainable)`` —
    one row per turn, 1-based ``turn_idx`` in ``order_cols`` order
    (pass a tie-breaking unique column last: offsets require a TOTAL
    order to be well-defined).

    100 TB design: one window shuffle keyed on the conversation id does
    everything — turn index (row_number) and start offset (running sum
    of rendered lengths) ride the same sort; rendering is scan-stage
    string concat. Downstream tokenization maps char spans to token
    spans inside the same Arrow batch, so the mask never needs a second
    pass over the corpus.
    """
    rendered_len = (
        F.length(F.col(role_col))
        + F.length(F.col(content_col))
        + F.lit(5)  # '<|' + '|>' + '\n'
    )
    w = Window.partitionBy(conv_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    start = F.coalesce(
        F.sum(rendered_len).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("bigint")
    roles = [str(r) for r in trainable_roles]
    return df.select(
        F.col(conv_col),
        F.row_number().over(w).alias("turn_idx"),
        F.col(role_col).alias("role"),
        start.alias("start_char"),
        (start + rendered_len).cast("bigint").alias("end_char"),
        F.col(role_col).isin(*roles).cast("int").alias("is_trainable"),
    )
