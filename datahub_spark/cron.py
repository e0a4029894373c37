"""Wall-clock cron triggering for the jobs scheduler.

Reference parity: internal/jobs/scheduler.go (775 lines) parses cron
specs and fires registered jobs. Semantics follow standard 5-field cron
(minute hour day-of-month month day-of-week) with the classic rule that
when BOTH day-of-month and day-of-week are restricted, a time matches if
EITHER matches (vixie-cron / robfig-cron behavior the reference uses).

Fields support: ``*``, ``*/step``, ``a``, ``a-b``, ``a-b/step``, and
comma lists of any of those. Day-of-week 0 and 7 both mean Sunday.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

_BOUNDS = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]
_NAMES = ["minute", "hour", "day-of-month", "month", "day-of-week"]


def _parse_field(text: str, lo: int, hi: int, name: str) -> tuple[set[int], bool]:
    """-> (allowed values, is_wildcard). dow 7 normalizes to 0 (Sunday)."""
    allowed: set[int] = set()
    wildcard = text == "*"
    for part in text.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron {name}: step must be positive")
        if part == "*":
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron {name}: '{part}' outside {lo}-{hi}")
        allowed.update(range(start, end + 1, step))
    if name == "day-of-week" and 7 in allowed:
        allowed.discard(7)
        allowed.add(0)
    return allowed, wildcard


_DESCRIPTORS = {
    "@hourly": "0 * * * *",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@weekly": "0 0 * * 0",
    "@monthly": "0 0 1 * *",
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
}


def _descriptor_to_fields(spec: str) -> str:
    """Named robfig/cron ``@`` descriptors -> 5-field grid cron.
    (``@every`` is NOT handled here: it is a fixed-interval timer, kept
    as CronSpec.interval_minutes and evaluated via CronSpec.due —
    sub-minute intervals clamp to this scheduler's 1-minute tick, the
    only remaining approximation.)"""
    if spec in _DESCRIPTORS:
        return _DESCRIPTORS[spec]
    raise ValueError(f"unsupported cron descriptor: {spec!r}")


@dataclass(frozen=True)
class CronSpec:
    minutes: frozenset
    hours: frozenset
    doms: frozenset
    months: frozenset
    dows: frozenset
    dom_any: bool
    dow_any: bool
    spec: str
    # robfig fixed-interval mode (``@every 90m``): fires every N minutes
    # from the previous firing, NOT on grid minutes — so 90m means 90m,
    # never "hourly", and 7m fires :56 then :03 across the hour. Gated
    # through due(); the grid fields are all-wildcard in this mode.
    interval_minutes: int | None = None

    @classmethod
    def parse(cls, spec: str) -> "CronSpec":
        original = spec.strip()
        spec = original
        interval = None
        if spec.startswith("@every"):
            # robfig fixed-interval descriptor: keep the TRUE interval
            # (clamped to this scheduler's 1-minute tick resolution) and
            # evaluate it against the last firing via due(); ``spec``
            # keeps the ORIGINAL descriptor so listings echo the config
            import re as _re

            m = _re.fullmatch(r"@every\s+((?:\d+[hms])+)", spec)
            if not m:
                raise ValueError(f"unsupported cron descriptor: {spec!r}")
            secs = 0
            for n, unit in _re.findall(r"(\d+)([hms])", m.group(1)):
                secs += int(n) * {"h": 3600, "m": 60, "s": 1}[unit]
            interval = max(1, secs // 60)
            spec = "* * * * *"
        elif spec.startswith("@"):
            # named descriptors (@daily, @hourly, ...) are grid specs
            spec = _descriptor_to_fields(spec)
        fields = spec.split()
        if len(fields) != 5:
            raise ValueError(f"cron spec needs 5 fields, got {len(fields)}: {spec!r}")
        vals, wilds = [], []
        for text, (lo, hi), name in zip(fields, _BOUNDS, _NAMES):
            v, w = _parse_field(text, lo, hi, name)
            vals.append(frozenset(v))
            wilds.append(w)
        return cls(vals[0], vals[1], vals[2], vals[3], vals[4],
                   dom_any=wilds[2], dow_any=wilds[4], spec=original,
                   interval_minutes=interval)

    def matches(self, t: datetime) -> bool:
        # day rule: python isoweekday Mon=1..Sun=7 -> cron Sun=0; when
        # both dom and dow are restricted, vixie OR rule applies.
        # Interval specs are all-wildcard here — schedulers must gate
        # them through due(), which knows the last firing.
        return (t.minute in self.minutes and t.hour in self.hours
                and t.month in self.months and self._day_matches(t))

    def due(self, now: datetime, last: datetime | None) -> bool:
        """Should a job with this spec fire at ``now``, given the minute
        it last fired (``None`` = never)? Grid specs: the minute matches
        and hasn't fired yet. Interval specs (robfig ``@every``): the
        full interval has elapsed since the last firing — a fresh
        registration fires on the next tick, as robfig's timer does on
        start."""
        minute = now.replace(second=0, microsecond=0)
        if self.interval_minutes is not None:
            if last is None:
                return True
            return (minute - last).total_seconds() >= self.interval_minutes * 60
        return self.matches(now) and last != minute

    def _day_matches(self, t: datetime) -> bool:
        dom_ok = t.day in self.doms
        dow_ok = (t.isoweekday() % 7) in self.dows
        if self.dom_any and self.dow_any:
            return True
        if self.dom_any:
            return dow_ok
        if self.dow_any:
            return dom_ok
        return dom_ok or dow_ok

    def next_after(self, t: datetime) -> datetime:
        """First matching minute strictly after t. Steps by day, then
        picks the next allowed (hour, minute) slot directly — the 4-year
        search bound covers leap-day-only specs like '0 0 29 2 *'.
        Interval specs: one full interval after t (robfig's timer)."""
        if self.interval_minutes is not None:
            return (t.replace(second=0, microsecond=0)
                    + timedelta(minutes=self.interval_minutes))
        cur = t.replace(second=0, microsecond=0) + timedelta(minutes=1)
        for _ in range(4 * 366 + 1):
            if cur.month in self.months and self._day_matches(cur):
                for h in sorted(self.hours):
                    if h < cur.hour:
                        continue
                    for m in sorted(self.minutes):
                        if h == cur.hour and m < cur.minute:
                            continue
                        return cur.replace(hour=h, minute=m)
            cur = (cur + timedelta(days=1)).replace(hour=0, minute=0)
        raise ValueError(f"no firing time within 4 years for {self.spec!r}")
