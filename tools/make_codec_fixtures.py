"""Generate the committed codec fixture assets (tests/fixtures/).

- gradient_8x8.bmp: 8x8 24-bit BMP, pixels 0,4,8,...,252 row-major.
- tone_440.wav: 10 ms of a 440 Hz square-ish tone at 16 kHz, amplitude
  12000 (values chosen so decoded stats are exact integers).

Deterministic; rerun only if the fixture contract changes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from machine_learning_with_spark_streaming_spark.operators.codecs import encode_bmp_gray, encode_wav_pcm16  # noqa: E402

OUT = os.path.join(REPO, "tests", "fixtures")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    gray = bytes(i * 4 for i in range(64))
    with open(os.path.join(OUT, "gradient_8x8.bmp"), "wb") as f:
        f.write(encode_bmp_gray(gray, 8, 8))
    # 160 frames = 10 ms @ 16 kHz; square wave, period ~36 frames (444 Hz)
    samples = [12000 if (i // 18) % 2 == 0 else -12000 for i in range(160)]
    with open(os.path.join(OUT, "tone_440.wav"), "wb") as f:
        f.write(encode_wav_pcm16(samples, 16000))
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
