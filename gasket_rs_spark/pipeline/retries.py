"""Retry policy with exponential backoff — parity with the reference's
retry semantics (gasket/src/retries.rs:5-78):

- a unit is attempted ``max_retries + 1`` times total (runtime.rs:627-659);
- delay before retry n (1-based) is ``backoff_unit * backoff_factor**n``
  capped at ``max_backoff`` (retries.rs:74-78, compute_backoff_delay uses
  ``factor.pow(retry)`` with the 1-based count); the first attempt has no
  delay (retries.rs:29-32);
- ``dismissible: true`` means a maxed-out unit is skipped and work
  continues; otherwise the failure propagates (runtime.rs:272-275).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RetryPolicy:
    max_retries: int = 0
    backoff_unit: float = 0.001  # seconds
    backoff_factor: float = 2.0
    max_backoff: float = 60.0  # seconds
    dismissible: bool = False

    def backoff_delay(self, retry: int) -> float:
        """Delay before the given retry (1-based). retries.rs:74-78."""
        if retry <= 0:
            return 0.0
        return min(self.backoff_unit * (self.backoff_factor ** retry), self.max_backoff)


@dataclass
class Retry:
    """Mutable retry counter for one unit of work (retries.rs:17-47)."""

    policy: RetryPolicy
    count: int = 0
    _sleep: object = field(default=time.sleep, repr=False)

    def maxed(self) -> bool:
        return self.count > self.policy.max_retries

    def next(self) -> None:
        self.count += 1

    def wait_backoff(self, cancelled=None) -> None:
        """Sleep the backoff for the current retry; polls ``cancelled``
        (a zero-arg callable) so dismissal interrupts the wait — the
        fast-teardown guarantee (runtime.rs:691-719)."""
        delay = self.policy.backoff_delay(self.count)
        if delay <= 0:
            return
        if cancelled is None:
            self._sleep(delay)
            return
        deadline = time.monotonic() + delay
        while time.monotonic() < deadline:
            if cancelled():
                return
            self._sleep(min(0.005, max(0.0, deadline - time.monotonic())))


def retry_call(fn, policy: RetryPolicy, cancelled=None, on_dismiss=None):
    """Run ``fn`` under the policy: max_retries+1 attempts, exponential
    backoff between them. Returns fn's value; on exhaustion either calls
    ``on_dismiss`` (dismissible) or re-raises the last error."""
    retry = Retry(policy)
    while True:
        if cancelled is not None and cancelled():
            return None
        try:
            return fn()
        except Exception:
            retry.next()
            if retry.maxed():
                if policy.dismissible and on_dismiss is not None:
                    on_dismiss()
                    return None
                raise
            retry.wait_backoff(cancelled)
