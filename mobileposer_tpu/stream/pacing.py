"""Absolute-deadline rate pacing for realtime loops.

Every realtime loop in the streaming stack (the PoseServer tick, the
packet/frame replayers, reference semantics: the 30 fps live loop of
mobileposer/live_demo.py:207-264) must hold a target rate on a busy
1-core host where ``time.sleep`` routinely overshoots by 1-4 ms (OS
timer granularity + GIL contention with fetcher/ingest threads).

Relative pacing — ``sleep(period - work)`` re-anchored at each
iteration — adds that overshoot to EVERY period: at 30 Hz a 2-4 ms
systematic overshoot yields 27-28 Hz sustained (measured: the r5
`serving_tick_exact_pipelined` row showed 27.65 Hz with a 7.7 ms
tick p50, i.e. 25 ms of slack thrown away per tick).

`Pacer` keeps deadlines on an ABSOLUTE schedule: tick N is due at
``t0 + N*period``, so one sleep's overshoot eats into the next
interval's slack instead of accumulating into the period. If the loop
falls more than one period behind (a compile, a GC pause), it realigns
to now rather than bursting to catch up — realtime consumers want a
steady rate, not a packet flood.
"""

from __future__ import annotations

import time


class Pacer:
    """Hold a loop at ``1/period`` Hz with absolute deadlines.

    Usage::

        pacer = Pacer(1.0 / 30.0)
        while running:
            do_work()
            pacer.wait()          # sleeps until the next absolute slot

    ``clock`` / ``sleep`` are injectable for deterministic tests.
    """

    __slots__ = ("period", "_clock", "_sleep", "_next")

    def __init__(self, period: float, *, clock=time.perf_counter,
                 sleep=time.sleep):
        if period <= 0:
            raise ValueError(f"period must be positive, got {period}")
        self.period = period
        self._clock = clock
        self._sleep = sleep
        # first deadline is one period after construction (arm the
        # schedule when the loop starts, not lazily on first wait —
        # the first work unit already consumes slot 0)
        self._next = clock() + period

    def wait(self) -> None:
        """Sleep until the next scheduled slot, then advance it.

        If the loop is already past the deadline (work ran long), do
        not sleep and realign the schedule to now + period: missed
        slots are dropped, never bursted.
        """
        now = self._clock()
        if now < self._next:
            self._sleep(self._next - now)
            # advance on the absolute schedule — sleep overshoot does
            # NOT move the next deadline
            self._next += self.period
        else:
            self._next = now + self.period
