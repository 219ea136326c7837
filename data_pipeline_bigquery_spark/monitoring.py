"""Run monitoring — the reference's ``@workflow_monitoring`` decorator
(``/root/reference/pipeline/functions/functions.py:26-40``) posts a
Google Chat card with duration + row count
(``config/google_chat/google_chat.py:35-107``).

Engine version: same timing/row-count contract, emitted to a pluggable
callback (default: a log record) so operational wiring stays out of the
dataflow.  Duration formatting mirrors ``seconds_to_hms``
(``google_chat.py:23-32``).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable

logger = logging.getLogger("data_pipeline_bigquery_spark.monitoring")


def seconds_to_hms(seconds: float) -> str:
    """C14 duration_format: seconds → 'H hours, M minutes, S seconds'."""
    h, rem = divmod(int(seconds), 3600)
    m, s = divmod(rem, 60)
    return f"{h} hours, {m} minutes, {s} seconds"


def workflow_monitoring(
    name: str | None = None,
    notify: Callable[[dict], None] | None = None,
):
    """Wrap a pipeline entrypoint returning a row count; time it and
    emit ``{workflow, rows, duration_s, duration_hms, status}``."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            workflow = name or fn.__name__
            t0 = time.time()
            try:
                rows = fn(*args, **kwargs)
                status = "success"
                return rows
            except Exception:
                rows, status = None, "failed"
                raise
            finally:
                dur = time.time() - t0
                record = {
                    "workflow": workflow,
                    "rows": rows,
                    "duration_s": round(dur, 3),
                    "duration_hms": seconds_to_hms(dur),
                    "status": status,
                }
                (notify or (lambda r: logger.info("workflow run: %s", r)))(record)

        return wrapper

    return deco
