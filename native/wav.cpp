// Native WAV codec + PCM conversion.
//
// Same decode semantics as srack_tpu/io/wav.py (which mirrors the
// reference's hound-based loader, reference src/synth/sample.rs:32-69):
// RIFF parse, PCM 8/16/24/32-bit int and 32-bit float, channel 0 only,
// int scaling 1/(MAX+1).  Plus the interleave + i16 conversion the
// reference's audio callback does on the fly (main.rs:78).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

}  // namespace

extern "C" {

// Two-phase decode: with out == nullptr, sets *n_samples / *sample_rate
// and returns 0; with out != nullptr writes up to *n_samples floats.
// Returns 0 on success, negative error codes otherwise.
int srack_wav_decode(const uint8_t* data, uint64_t len, float* out,
                     int64_t* n_samples, int32_t* sample_rate) {
  if (len < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0)
    return -1;

  const uint8_t* fmt = nullptr;
  const uint8_t* raw = nullptr;
  uint64_t raw_len = 0;
  uint64_t pos = 12;
  while (pos + 8 <= len) {
    uint32_t size = rd_u32(data + pos + 4);
    uint64_t body = pos + 8;
    if (body + size > len) size = static_cast<uint32_t>(len - body);
    if (std::memcmp(data + pos, "fmt ", 4) == 0) {
      fmt = data + body;
    } else if (std::memcmp(data + pos, "data", 4) == 0) {
      raw = data + body;
      raw_len = size;
    }
    pos = body + size + (size & 1);
  }
  if (!fmt || !raw) return -2;

  uint16_t audio_format = rd_u16(fmt);
  uint16_t channels = rd_u16(fmt + 2);
  uint32_t sr = rd_u32(fmt + 4);
  uint16_t bits = rd_u16(fmt + 14);
  if (channels == 0) return -3;
  if (audio_format == 0xFFFE) audio_format = (bits == 32) ? 3 : 1;

  uint64_t bytes_per = bits / 8;
  if (bytes_per == 0) return -4;
  uint64_t total = raw_len / bytes_per;
  uint64_t frames = total / channels;
  *sample_rate = static_cast<int32_t>(sr);
  if (!out) {
    *n_samples = static_cast<int64_t>(frames);
    return 0;
  }
  uint64_t want = std::min<uint64_t>(frames, static_cast<uint64_t>(*n_samples));

  for (uint64_t i = 0; i < want; ++i) {
    const uint8_t* s = raw + i * channels * bytes_per;  // channel 0 only
    float v = 0.0f;
    if (audio_format == 3 && bits == 32) {
      float f;
      std::memcpy(&f, s, 4);
      v = f;
    } else if (audio_format == 1 && bits == 8) {
      v = (static_cast<int>(s[0]) - 128) / 128.0f;
    } else if (audio_format == 1 && bits == 16) {
      int16_t x = static_cast<int16_t>(rd_u16(s));
      v = x / 32768.0f;
    } else if (audio_format == 1 && bits == 24) {
      int32_t x = static_cast<int32_t>(s[0]) | (static_cast<int32_t>(s[1]) << 8) |
                  (static_cast<int32_t>(s[2]) << 16);
      if (x >= (1 << 23)) x -= (1 << 24);
      v = x / 8388608.0f;
    } else if (audio_format == 1 && bits == 32) {
      int32_t x;
      std::memcpy(&x, s, 4);
      v = static_cast<float>(x / 2147483648.0);
    } else {
      return -5;
    }
    out[i] = v;
  }
  *n_samples = static_cast<int64_t>(want);
  return 0;
}

// [channels][n] planar f32 -> interleaved i16 PCM with clipping
// (the audio-callback interleave, reference src/main.rs:78).
void srack_interleave_i16(const float* planar, int32_t channels, int64_t n,
                          int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t c = 0; c < channels; ++c) {
      float v = planar[static_cast<int64_t>(c) * n + i] * 32767.0f;
      v = std::max(-32768.0f, std::min(32767.0f, std::round(v)));
      out[i * channels + c] = static_cast<int16_t>(v);
    }
  }
}

}  // extern "C"
