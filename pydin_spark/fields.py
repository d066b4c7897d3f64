"""Lineage key fields injected into loaded rows.

Parity target: reference ``pydin/fields.py`` — ``run_id/task_id/step_id/
process_id`` fields whose ``label``/``value`` pairs are appended to every
record at load time (``models.py:227-232``). In Spark this is a single
``withColumn(label, lit(value))`` — a zero-cost projection Catalyst folds
into the write, no per-record Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class KeyField:
    """A lineage column: label + per-run value source."""

    def __init__(self, label: str, attribute: str):
        self.label = label
        #: attribute looked up on the running task/pipeline for the value
        self.attribute = attribute

    def value_for(self, context) -> int | None:
        return getattr(context, self.attribute, None)

    def apply(self, df: DataFrame, context) -> DataFrame:
        return df.withColumn(self.label, F.lit(self.value_for(context)))


#: The reference's four canonical lineage keys (fields.py:29-31 naming).
RUN_ID = KeyField("pd_run_id", "run_id")
TASK_ID = KeyField("pd_task_id", "task_id")
STEP_ID = KeyField("pd_step_id", "step_id")
PROCESS_ID = KeyField("pd_process_id", "process_id")

KEY_FIELDS = {
    "run_id": RUN_ID,
    "task_id": TASK_ID,
    "step_id": STEP_ID,
    "process_id": PROCESS_ID,
}


def resolve(name_or_field) -> KeyField:
    if isinstance(name_or_field, KeyField):
        return name_or_field
    if isinstance(name_or_field, str):
        key = name_or_field.removeprefix("pd_")
        if key in KEY_FIELDS:
            return KEY_FIELDS[key]
    raise ValueError(f"unknown key field: {name_or_field!r}")
