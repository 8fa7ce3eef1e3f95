"""Streaming TTS client: play audio while the server is still decoding.

Talks to `python -m phoonnx_tpu.serve` and consumes the chunked raw-PCM
response ("stream": true). Chunks arrive as the vocoder produces them
(sub-sentence latency), so playback/writing can start after the first
~1.5 s of audio is decoded instead of after the whole utterance.

Usage:
    python -m phoonnx_tpu.serve --model voice.onnx --port 8080 &
    python examples/stream_client.py --port 8080 \
        --text "A long paragraph of text..." --output out.wav
"""

import argparse
import http.client
import json
import sys
import time
import wave


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--text", required=True)
    ap.add_argument("--output", required=True, help="output WAV path")
    ap.add_argument("--voice", default=None, help="voice name (multi-voice)")
    args = ap.parse_args()

    body = {"text": args.text, "stream": True}
    if args.voice:
        body["voice"] = args.voice
    conn = http.client.HTTPConnection(args.host, args.port, timeout=300)
    t0 = time.perf_counter()
    conn.request("POST", "/synthesize", body=json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    if resp.status != 200:
        print(f"error {resp.status}: {resp.read().decode()}",
              file=sys.stderr)
        return 1
    rate = int(resp.getheader("X-Sample-Rate", "22050"))
    width = int(resp.getheader("X-Sample-Width", "2"))
    channels = int(resp.getheader("X-Channels", "1"))

    first = None
    total = 0
    truncated = False
    with wave.open(args.output, "wb") as wav:
        wav.setnchannels(channels)
        wav.setsampwidth(width)
        wav.setframerate(rate)
        while True:
            # http.client decodes the chunked transfer encoding for us;
            # read whatever PCM has arrived so far
            try:
                chunk = resp.read(8192)
            except http.client.IncompleteRead as exc:
                # the server drops the connection mid-stream when the
                # engine errors after headers went out — keep what
                # arrived, but say so
                chunk = exc.partial
                truncated = True
            if not chunk:
                break
            if first is None:
                first = time.perf_counter() - t0
                print(f"first audio after {first * 1000:.0f} ms")
            wav.writeframes(chunk)
            total += len(chunk) // (width * channels)
            if truncated:
                break
    conn.close()
    if truncated:
        print(f"stream aborted by server after {total / rate:.2f}s — "
              f"partial audio saved to {args.output}", file=sys.stderr)
        return 1
    print(f"wrote {args.output}: {total / rate:.2f}s of audio "
          f"in {time.perf_counter() - t0:.2f}s total")
    return 0


if __name__ == "__main__":
    sys.exit(main())
