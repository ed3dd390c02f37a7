#!/bin/bash
# Keyframe (I-frame) extraction for each video clip, feeding the visual
# encoder (capability of data_process/key_frames.sh: ffmpeg select
# pict_type I -> keyframes_<name>/keyframe_%03d.jpg).
#
# Usage: key_frames.sh <video.mp4> [more videos...]
set -euo pipefail

if [ "$#" -lt 1 ]; then
    echo "Usage: $0 <video> [video...]" >&2
    exit 1
fi

command -v ffmpeg >/dev/null || { echo "ffmpeg not found on PATH" >&2; exit 1; }

for video in "$@"; do
    [ -f "$video" ] || { echo "skip missing $video" >&2; continue; }
    name=$(basename "${video%.*}")
    outdir="keyframes_${name}"
    mkdir -p "$outdir"
    ffmpeg -hide_banner -loglevel error -i "$video" \
        -vf "select='eq(pict_type,I)'" -vsync vfr \
        "${outdir}/keyframe_%03d.jpg"
    echo "$video -> $outdir ($(ls "$outdir" | wc -l) keyframes)"
done
