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

    first = None
    total = 0
    with wave.open(args.output, "wb") as wav:
        wav.setnchannels(1)
        wav.setsampwidth(2)
        wav.setframerate(rate)
        while True:
            # http.client decodes the chunked transfer encoding for us;
            # read whatever PCM has arrived so far
            chunk = resp.read(8192)
            if not chunk:
                break
            if first is None:
                first = time.perf_counter() - t0
                print(f"first audio after {first * 1000:.0f} ms")
            wav.writeframes(chunk)
            total += len(chunk) // 2
    conn.close()
    print(f"wrote {args.output}: {total / rate:.2f}s of audio "
          f"in {time.perf_counter() - t0:.2f}s total")
    return 0


if __name__ == "__main__":
    sys.exit(main())
