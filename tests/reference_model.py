"""Pure-Python executable model of the reference Q1 aggregate.

Transcribed semantics (not code) of UserAggregate.java:17-38 plus
event-time-ordered processing (SURVEY.md §2.3.2-3): the ground truth the
Spark latch implementation is property-tested against.
"""

from __future__ import annotations

NO_DEPARTMENT = {None, "", "N/A"}
SESSION_GAP_MS = 1_000


def q1_session_aggregate(events: list[dict]) -> dict:
    """Run the reference per-session aggregate over one session's events.

    events: dicts with keys ts (ms), seq, event_type, product_type.
    Processing order: (ts, seq) ascending — the watermark/event-time order
    the reference observes in practice.
    """
    ordered = sorted(events, key=lambda e: (e["ts"], e["seq"]))
    event_count = 0
    latch = 0
    depts: set[str] = set()
    for e in ordered:
        if e["product_type"] not in NO_DEPARTMENT:
            event_count += 1
            depts.add(e["product_type"])
        if e["event_type"] == "order_checkout":
            latch = event_count
    return {
        "eventCount": event_count,
        "orderCheckoutEventCount": latch,
        "deptList": sorted(depts),
    }


def sessionize_events(events: list[dict], gap_ms: int = SESSION_GAP_MS) -> list[list[dict]]:
    """Gap-and-islands split of one user's events.

    New session when the event-time delta is strictly greater than the gap:
    Spark ``session_window`` merges events exactly ``gap`` apart (its window
    end is inclusive of a coinciding next start), where Flink would split.
    The engine standardizes on Spark's behavior.
    """
    ordered = sorted(events, key=lambda e: (e["ts"], e["seq"]))
    sessions: list[list[dict]] = []
    for e in ordered:
        if sessions and e["ts"] - sessions[-1][-1]["ts"] <= gap_ms:
            sessions[-1].append(e)
        else:
            sessions.append([e])
    return sessions
