#!/usr/bin/env bash
# Deliberate co-load for the bench-comparator A/B (r18 verdict item 1):
# reproduce the r18 driver window's contention shape — a sustained
# CPU-heavy analytical job (the >90-min DuckDB gopher twin) sharing the
# box with the bench. N busy workers + one tmp-file writer loop.
#
# Usage: tools/coload.sh start [workers]   # default 16
#        tools/coload.sh stop
set -euo pipefail
PIDFILE=/tmp/graft_coload.pids
case "${1:-}" in
  start)
    n="${2:-16}"
    : > "$PIDFILE"
    for i in $(seq 1 "$n"); do
      ( while :; do :; done ) & echo $! >> "$PIDFILE"
    done
    # one I/O writer: the index-build queries are write-heavy and the
    # r18 inflation concentrated there
    ( while :; do dd if=/dev/zero of=/tmp/graft_coload_io bs=1M count=256 \
        conv=fsync 2>/dev/null; done ) & echo $! >> "$PIDFILE"
    echo "coload: $n cpu workers + 1 io writer (pids in $PIDFILE)"
    ;;
  stop)
    [[ -f "$PIDFILE" ]] && xargs -r kill < "$PIDFILE" 2>/dev/null || true
    rm -f "$PIDFILE" /tmp/graft_coload_io
    echo "coload: stopped"
    ;;
  *) echo "usage: $0 start [workers] | stop" >&2; exit 1 ;;
esac
