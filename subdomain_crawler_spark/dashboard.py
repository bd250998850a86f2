"""Text dashboard — the presenter twin of the reference's TUI
(/root/reference/pkg/interface/presenter/dashboard.go:178-247: uptime,
tasks/s, HTTP req/s, success %, and the recent-discoveries ring).

The reference renders a live termui screen off in-process atomic counters;
here the same figures derive from per-round ``RoundStats`` (A1 counters ride
the round's writes as Observations — zero extra Spark jobs) plus a
driver-side pyarrow peek at the just-committed ``seen`` round directory for
the discoveries ring (local parquet head — again no Spark job, mirroring
A3's ring semantics of "most recent K discoveries").

Rendering is plain ANSI text to stderr, refreshed per round: a Spark crawl
advances in rounds, not per-task ticks, so a per-round repaint carries
exactly the same information content as the reference's 1 Hz timer
(dashboard.go:186 ticker) without a terminal-UI dependency.  When the
stream is not a TTY the repaint escape codes are suppressed and rounds
append — log-friendly.
"""

from __future__ import annotations

import sys
import time


class TextDashboard:
    """Accumulates RoundStats and repaints a counters/rates/ring panel."""

    def __init__(self, io=None, ring_size: int = 10, out=None):
        self.io = io
        self.ring_size = ring_size
        self.out = out if out is not None else sys.stderr
        self.t0 = time.monotonic()
        self.tasks = 0
        self.http = 0
        self.dns = 0
        self.success = 0
        self.errors = 0
        self.novel = 0
        self.rounds = 0
        self.ring: list[str] = []
        self._painted = False

    # -- data ----------------------------------------------------------------

    def _peek_ring(self, rnd: int) -> None:
        """Driver-side head of the committed seen/round=N dir (no Spark job)."""
        if self.io is None:
            return
        try:
            import pyarrow.dataset as ds

            path = self.io.round_dir("seen", rnd)
            hosts = (ds.dataset(path).head(self.ring_size)
                     .column("host").to_pylist())
        except Exception:
            return
        for h in hosts:
            self.ring.append(str(h))
        self.ring = self.ring[-self.ring_size:]

    def update(self, st) -> None:
        """Feed one RoundStats; repaint."""
        self.rounds += 1
        self.tasks += st.tasks_processed
        self.http += st.http_requests
        self.dns += st.dns_requests
        self.success += st.success_count
        self.errors += st.error_count
        self.novel += st.unique_subdomains
        self._peek_ring(st.round)
        self.render()

    # -- view ----------------------------------------------------------------

    def render(self) -> None:
        up = time.monotonic() - self.t0
        rate = lambda n: f"{n / up:.1f}/s" if up > 0 else "-"
        attempts = self.success + self.errors
        pct = 100.0 * self.success / attempts if attempts else 0.0
        lines = [
            "┌─ subdomain-crawler-spark ─ live ──────────────────────────┐",
            f"│ uptime {up:8.1f}s   rounds {self.rounds:<4}"
            f"  success {pct:5.1f}%              │",
            f"│ tasks  {self.tasks:>10}  ({rate(self.tasks):>10})"
            f"   http {self.http:>10} ({rate(self.http):>10}) │",
            f"│ dns    {self.dns:>10}  ({rate(self.dns):>10})"
            f"   new  {self.novel:>10} ({rate(self.novel):>10}) │",
            "├─ recent discoveries ──────────────────────────────────────┤",
        ]
        shown = self.ring[-self.ring_size:] or ["(none yet)"]
        for h in shown:
            lines.append(f"│  {h:<57}│")
        lines.append("└───────────────────────────────────────────────────────────┘")
        tty = getattr(self.out, "isatty", lambda: False)()
        if tty and self._painted:
            # repaint in place: move cursor up over the previous frame
            self.out.write(f"\x1b[{self._last_height}F\x1b[J")
        self.out.write("\n".join(lines) + "\n")
        self.out.flush()
        self._last_height = len(lines)
        self._painted = True
