"""Spark-side statement-timeout guard.

The reference enforces ``SET statement_timeout`` on every database session
(reference operators.py:49,76,174), so a runaway query dies server-side.
The JDBC paths here already forward that as ``queryTimeout``; this module
adds the missing half — a guard for the *Spark* jobs an operator runs
(scan, shuffle, CSV write), which JDBC timeouts never cover.

Mechanism: the guarded block runs inside a dedicated job group; a
watchdog thread cancels the group (``interruptOnCancel``) when the
deadline passes — including jobs still in submission at that moment —
and the block raises :class:`QueryTimeoutError`.
Job-group cancellation is Spark's own cooperative cancel — tasks stop at
the next record boundary, executors stay healthy, and only the guarded
statement dies, exactly like a server-side statement_timeout.
"""

from __future__ import annotations

import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = ["QueryTimeoutError", "statement_timeout"]


class QueryTimeoutError(TimeoutError):
    """A guarded statement exceeded its timeout and was cancelled."""


@contextmanager
def statement_timeout(
    spark: SparkSession, timeout_minutes: float, description: str = "statement"
):
    """Run the enclosed Spark actions under a wall-clock deadline.

    Every job started by the current thread inside the block belongs to a
    fresh job group; on expiry the watchdog cancels the group and the
    block's pending action fails, surfaced as :class:`QueryTimeoutError`.
    ``timeout_minutes`` may be fractional (the reference's unit is minutes;
    tests use seconds-scale fractions).
    """
    sc = spark.sparkContext
    group = f"stmt_timeout_{uuid.uuid4().hex[:12]}"
    expired = threading.Event()
    done = threading.Event()

    def _watchdog() -> None:
        if done.wait(timeout_minutes * 60.0):
            return
        expired.set()
        while not done.is_set():
            # cancelJobGroup only kills jobs ACTIVE at call time; a job
            # still in submission (UDF pickling, analysis, cold Python
            # workers) when the deadline passes would slip through a
            # single cancel. Prefer the JVM-side and-future-jobs variant
            # (Spark 4); re-issue as a fallback until the block exits.
            try:
                jvm_sc = sc._jsc.sc()
                if hasattr(jvm_sc, "cancelJobGroupAndFutureJobs"):
                    jvm_sc.cancelJobGroupAndFutureJobs(group)
                else:  # pragma: no cover - Spark < 4
                    sc.cancelJobGroup(group)
            except Exception:  # pragma: no cover - sc already stopped
                return
            done.wait(0.25)

    timer = threading.Thread(target=_watchdog, daemon=True)
    # Capture the caller's job-group properties so nesting is safe: an
    # enclosing statement_timeout (or any caller-set job group) must get its
    # group back when this guard exits, or its watchdog could no longer
    # cancel jobs submitted after the inner block (ADVICE r3).
    _KEYS = ("spark.jobGroup.id", "spark.job.description", "spark.job.interruptOnCancel")
    saved = {k: sc.getLocalProperty(k) for k in _KEYS}
    sc.setJobGroup(group, description, interruptOnCancel=True)
    timer.start()
    try:
        yield
        if expired.is_set():
            raise QueryTimeoutError(
                f"{description} exceeded {timeout_minutes} min and was cancelled"
            )
    except QueryTimeoutError:
        raise
    except Exception as exc:
        if expired.is_set():
            raise QueryTimeoutError(
                f"{description} exceeded {timeout_minutes} min and was cancelled"
            ) from exc
        raise
    finally:
        done.set()
        # clearJobGroup is gone in PySpark 4 — restore the thread-local
        # properties setJobGroup wrote to their pre-guard values (None for
        # a top-level guard; the enclosing group when nested).
        for k, v in saved.items():
            sc.setLocalProperty(k, v)
