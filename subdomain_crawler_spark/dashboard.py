"""Text dashboard — the presenter twin of the reference's TUI
(/root/reference/pkg/interface/presenter/dashboard.go:178-247: uptime,
tasks/s, HTTP req/s, success %, and the recent-discoveries ring).

The reference renders a live termui screen off in-process atomic counters;
here the same figures derive from per-round ``RoundStats`` (A1 counters ride
the round's writes as Observations — zero extra Spark jobs) plus a
driver-side pyarrow peek at the just-committed ``seen`` round directory for
the discoveries ring (local parquet head — again no Spark job, mirroring
A3's ring semantics of "most recent K discoveries").

Rendering is plain ANSI text to stderr.  Two cadences compose:

* per-round ``update()`` — new counter/ring/active DATA arrives only when a
  round commits (a Spark crawl advances in rounds, not per-task ticks);
* an optional 1 Hz ticker thread (``start_ticker()``) — the animated-repaint
  twin of the reference's ``time.Tick(1s)`` loop (dashboard.go:186): between
  rounds the uptime clock and the derived /s rates keep advancing, so the
  panel visibly ticks once a second exactly as the termui screen does.

The ticker only runs on a TTY; when the stream is not a TTY the repaint
escape codes are suppressed and rounds append — log-friendly.
"""

from __future__ import annotations

import sys
import threading
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
        self.active: list[str] = []
        self._painted = False
        self._lock = threading.RLock()  # update() vs ticker repaint
        self._stop = threading.Event()
        self._ticker: threading.Thread | None = None

    # -- 1 Hz animation (dashboard.go:186 ticker twin) -----------------------

    def start_ticker(self, hz: float = 1.0) -> None:
        """Repaint the panel ``hz`` times a second from a daemon thread so
        uptime and the derived rates animate between round commits, like the
        reference's termui tick loop.  TTY-only: on a non-TTY stream each
        frame would append a new copy, so the ticker is a no-op there."""
        tty = getattr(self.out, "isatty", lambda: False)()
        if not tty or self._ticker is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(1.0 / hz):
                self.render()

        self._ticker = threading.Thread(
            target=loop, name="dashboard-ticker", daemon=True)
        self._ticker.start()

    def stop_ticker(self) -> None:
        if self._ticker is None:
            return
        self._stop.set()
        self._ticker.join(timeout=2.0)
        self._ticker = None

    # -- data ----------------------------------------------------------------

    def _peek_ring(self, rnd: int) -> None:
        """Driver-side TAIL of the committed seen/round=N dir (no Spark job).

        The reference ring holds the most recent K discoveries
        (dashboard.go:241-247) — the last rows written, so read the tail of
        the round's rows, not the file head.  The read is BOUNDED: fragments
        are walked from the last file backwards and only until ring_size
        rows are in hand, so a billion-row round costs the driver one or two
        trailing row groups, never the whole column."""
        if self.io is None:
            return
        try:
            import pyarrow.dataset as ds

            path = self.io.round_dir("seen", rnd)
            hosts: list = []
            for frag in reversed(list(ds.dataset(path).get_fragments())):
                col = frag.to_table(columns=["host"]).column("host")
                hosts = col.to_pylist()[-(self.ring_size - len(hosts)):] + hosts
                if len(hosts) >= self.ring_size:
                    break
        except Exception:
            return
        for h in hosts:
            self.ring.append(str(h))
        self.ring = self.ring[-self.ring_size:]

    def _peek_active(self, rnd: int) -> None:
        """ActiveDomains twin (crawl_usecase.go:173-183, domain.go:55): the
        reference samples each live worker's current domain on the metrics
        tick; the Spark analog is the distinct roots in the frontier the
        round just processed — a driver-side pyarrow peek at the committed
        frontier/round=N dir, bounded rows, no Spark job."""
        if self.io is None:
            return
        try:
            import pyarrow.dataset as ds

            path = self.io.round_dir("frontier", rnd)
            roots = (ds.dataset(path).head(4096, columns=["root"])
                     .column("root").to_pylist())
        except Exception:
            return
        out: list[str] = []
        for r in roots:
            r = str(r)
            if r not in out:
                out.append(r)
            if len(out) >= 6:
                break
        self.active = out

    def update(self, st) -> None:
        """Feed one RoundStats; repaint.  Serialized against the ticker so a
        mid-mutation frame can never be painted."""
        with self._lock:
            self.rounds += 1
            self.tasks += st.tasks_processed
            self.http += st.http_requests
            self.dns += st.dns_requests
            self.success += st.success_count
            self.errors += st.error_count
            self.novel += st.unique_subdomains
            self._peek_ring(st.round)
            self._peek_active(st.round)
            self.render()

    # -- view ----------------------------------------------------------------

    _W = 66  # inner panel width; every row is padded/clipped to this

    def render(self) -> None:
        with self._lock:
            self._render_locked()

    def _render_locked(self) -> None:
        up = time.monotonic() - self.t0
        rate = lambda n: f"{n / up:.1f}/s" if up > 0 else "-"
        attempts = self.success + self.errors
        pct = 100.0 * self.success / attempts if attempts else 0.0
        W = self._W
        row = lambda s: f"│{s:<{W}.{W}}│"  # pad + clip: no overflow, no rag
        lines = [
            "┌─ subdomain-crawler-spark ─ live " + "─" * (W - 33) + "┐",
            row(f" uptime {up:8.1f}s   rounds {self.rounds:<4}"
                f"  success {pct:5.1f}%"),
            row(f" tasks  {self.tasks:>10}  ({rate(self.tasks):>10})"
                f"   http {self.http:>10} ({rate(self.http):>10})"),
            row(f" dns    {self.dns:>10}  ({rate(self.dns):>10})"
                f"   new  {self.novel:>10} ({rate(self.novel):>10})"),
            row(" active " + (", ".join(self.active) or "(idle)")),
            "├─ recent discoveries " + "─" * (W - 21) + "┤",
        ]
        shown = self.ring[-self.ring_size:] or ["(none yet)"]
        for h in shown:
            lines.append(row(f"  {h}"))
        lines.append("└" + "─" * W + "┘")
        tty = getattr(self.out, "isatty", lambda: False)()
        if tty and self._painted:
            # repaint in place: move cursor up over the previous frame
            self.out.write(f"\x1b[{self._last_height}F\x1b[J")
        self.out.write("\n".join(lines) + "\n")
        self.out.flush()
        self._last_height = len(lines)
        self._painted = True
