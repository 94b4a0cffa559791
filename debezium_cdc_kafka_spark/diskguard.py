"""Disk-budget guard for scale sweeps and spill-heavy queries.

Both r8 ×256 DBSCAN attempts burned the machine's free disk before
dying (artifacts_r8/x256_dbscan_fail_evidence.txt): Spark's
shuffle/sort spill has no global byte budget, so one plan-shape
mistake exhausts the SHARED local scratch volume and takes the whole
JVM — and anything co-located — down with it. This module inverts the
failure: abort the QUERY when free scratch drops below a floor, record
how much scratch it peaked at, and leave the machine healthy for the
next query in the sweep.

Two pieces:

- :func:`preflight` — refuse to start expensive work without disk
  headroom (the r9 sweep-runner contract: check BEFORE the first
  query, not after the disk is gone).
- :class:`SpillWatchdog` — a daemon thread sampling
  ``shutil.disk_usage`` over the scratch volume while a job runs; if
  free space crosses the floor it calls
  ``sparkContext.cancelJobGroup``/``cancelAllJobs`` so the in-flight
  action raises instead of filling the disk. It also tracks the
  max observed drop from the starting free-space level — the sweep's
  per-query "peak scratch" metric (exact while the machine is
  otherwise idle, which is the sweep hygiene rule anyway).

On a real cluster this role belongs to the resource manager
(YARN/K8s local-dir quotas and the external shuffle service's
eviction); in local mode nothing else watches the volume, so we do.
"""

from __future__ import annotations

import shutil
import threading
import time

from pyspark.sql import SparkSession


class DiskBudgetError(RuntimeError):
    """Raised when scratch headroom is (or would be) exhausted."""


def free_bytes(path: str = "/tmp") -> int:
    """Free bytes on the volume holding `path` (Spark's default
    spill/scratch location when spark.local.dir is unset)."""
    return shutil.disk_usage(path).free


def preflight(min_free_gb: float, path: str = "/tmp") -> int:
    """Raise :class:`DiskBudgetError` unless at least `min_free_gb` GiB
    of scratch is free; returns the measured free bytes for logging."""
    free = free_bytes(path)
    need = int(min_free_gb * 2**30)
    if free < need:
        raise DiskBudgetError(
            f"preflight: {free / 2**30:.1f} GiB free on {path!r}, "
            f"need {min_free_gb:.1f} GiB — free scratch before the sweep"
        )
    return free


class SpillWatchdog:
    """Abort the running Spark job(s) if free scratch crosses a floor.

    Usage::

        with SpillWatchdog(spark, min_free_gb=8) as wd:
            df.write.format("noop").mode("overwrite").save()
        print(wd.peak_scratch_bytes, wd.tripped)

    When the floor is crossed the watchdog cancels the session's jobs;
    the blocked action raises a cancellation error, which callers
    should classify as a disk-budget abort iff ``wd.tripped``.
    """

    def __init__(
        self,
        spark: SparkSession,
        min_free_gb: float = 8.0,
        interval_s: float = 1.0,
        path: str = "/tmp",
    ):
        self._spark = spark
        self._floor = int(min_free_gb * 2**30)
        self._interval = interval_s
        self._path = path
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._start_free = 0
        self._min_free = 0
        self.tripped = False

    # -- metrics -----------------------------------------------------------

    @property
    def peak_scratch_bytes(self) -> int:
        """Max observed drop below the starting free level — the query's
        peak scratch footprint on an otherwise-idle machine."""
        return max(0, self._start_free - self._min_free)

    # -- lifecycle ---------------------------------------------------------

    def _run(self) -> None:
        while not self._stop.wait(self._interval):
            free = free_bytes(self._path)
            self._min_free = min(self._min_free, free)
            if free < self._floor and not self.tripped:
                self.tripped = True
                try:
                    # cancel every job of this (sweep-owned) session; the
                    # in-flight action raises instead of spilling further
                    self._spark.sparkContext.cancelAllJobs()
                except Exception:  # noqa: BLE001 — watchdog must not die
                    pass
                # keep sampling: a cancelled job's spill files are
                # cleaned asynchronously and min_free should capture the
                # true trough

    def start(self) -> "SpillWatchdog":
        self._start_free = self._min_free = free_bytes(self._path)
        if self._start_free < self._floor:
            # already below the floor — trip synchronously rather than
            # racing the first job against the sampler
            self.tripped = True
            raise DiskBudgetError(
                f"{self._start_free / 2**30:.1f} GiB free on "
                f"{self._path!r} is already below the "
                f"{self._floor / 2**30:.1f} GiB floor"
            )
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        return {
            "tripped": self.tripped,
            "peak_scratch_bytes": self.peak_scratch_bytes,
        }

    def __enter__(self) -> "SpillWatchdog":
        return self.start()

    def __exit__(self, exc_type, exc, tb) -> None:
        self.stop()
