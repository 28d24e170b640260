#!/bin/bash
# Re-render on scene save (reference: script/watch_render.sh) — dev loop.
# Usage: script/watch_render.sh scenes/cornell.pbrt [cli args...]
set -eu
scene="$1"; shift
render() { python -m curry_pbrt_tpu.cli "$scene" "$@" || true; }
render "$@"
last=$(stat -c %Y "$scene")
while sleep 1; do
  now=$(stat -c %Y "$scene")
  if [ "$now" != "$last" ]; then
    last=$now
    render "$@"
  fi
done
