// midi_codec: native Standard-MIDI-File parser/encoder for mst_tpu.
//
// Mirrors the pure-Python implementation in mst_tpu/io/smf.py exactly (event
// type codes, payload packing, error policy, running-status writing) — the
// Python module is the reference; byte-for-byte output parity is enforced by
// tests/test_native_codec.py. C ABI for ctypes binding (no pybind11 in this
// image).
//
// Replaces the reference's mido dependency on the hot ingestion/serialization
// path (SURVEY.md §2.1 "MIDI file I/O", style/midi.py:104-168).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

namespace {

enum EventType : int32_t {
  EV_NOTE_OFF = 0,
  EV_NOTE_ON = 1,
  EV_POLYTOUCH = 2,
  EV_CONTROL = 3,
  EV_PROGRAM = 4,
  EV_AFTERTOUCH = 5,
  EV_PITCHWHEEL = 6,
  EV_SYSEX = 7,
  EV_TEMPO = 8,
  EV_TIME_SIG = 9,
  EV_KEY_SIG = 10,
  EV_END_OF_TRACK = 11,
  EV_META_OTHER = 12,
};

struct TrackData {
  std::vector<int32_t> type;
  std::vector<int64_t> delta;
  std::vector<int32_t> channel;
  std::vector<int32_t> a;
  std::vector<int32_t> b;
};

struct Parser {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  bool ok = true;

  explicit Parser(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool avail(size_t n) const { return pos + n <= size; }

  uint8_t u8() {
    if (!avail(1)) { ok = false; return 0; }
    return data[pos++];
  }
  uint16_t u16() {
    if (!avail(2)) { ok = false; return 0; }
    uint16_t v = (uint16_t(data[pos]) << 8) | data[pos + 1];
    pos += 2;
    return v;
  }
  uint32_t u32() {
    if (!avail(4)) { ok = false; return 0; }
    uint32_t v = (uint32_t(data[pos]) << 24) | (uint32_t(data[pos + 1]) << 16) |
                 (uint32_t(data[pos + 2]) << 8) | data[pos + 3];
    pos += 4;
    return v;
  }
  uint32_t varlen() {
    uint32_t value = 0;
    for (int i = 0; i < 4; ++i) {
      if (!avail(1)) { ok = false; return 0; }
      uint8_t byte = data[pos++];
      value = (value << 7) | (byte & 0x7F);
      if (!(byte & 0x80)) return value;
    }
    ok = false;  // too long
    return 0;
  }
  uint8_t data_byte() {
    uint8_t byte = u8();
    if (byte > 127) ok = false;  // mido raises ValueError -> file skipped
    return byte;
  }
};

bool parse_track(Parser& p, size_t end, TrackData& out) {
  int running_status = -1;
  int64_t pending_delta = 0;
  while (p.ok && p.pos < end) {
    pending_delta += p.varlen();
    if (!p.ok || p.pos >= end) return false;
    int status = p.data[p.pos];
    if (status >= 0x80) {
      ++p.pos;
    } else {
      if (running_status < 0) return false;
      status = running_status;
    }

    if (status == 0xFF) {
      running_status = -1;
      uint8_t meta_type = p.u8();
      uint32_t length = p.varlen();
      if (!p.ok || p.pos + length > end) return false;
      const uint8_t* payload = p.data + p.pos;
      p.pos += length;
      int32_t ev, a = 0, b = 0;
      switch (meta_type) {
        case 0x51:
          if (length != 3) return false;
          ev = EV_TEMPO;
          a = (int32_t(payload[0]) << 16) | (int32_t(payload[1]) << 8) |
              payload[2];
          break;
        case 0x58:
          if (length < 2 || payload[1] > 30) return false;
          ev = EV_TIME_SIG;
          a = payload[0];
          b = 1 << payload[1];
          break;
        case 0x59: {
          if (length < 2) return false;
          int8_t sf = static_cast<int8_t>(payload[0]);
          if (sf < -7 || sf > 7 || payload[1] > 1) return false;
          ev = EV_KEY_SIG;
          a = sf;
          b = payload[1];
          break;
        }
        case 0x2F:
          ev = EV_END_OF_TRACK;
          break;
        default:
          ev = EV_META_OTHER;
          a = meta_type;
      }
      out.type.push_back(ev);
      out.delta.push_back(pending_delta);
      out.channel.push_back(-1);
      out.a.push_back(a);
      out.b.push_back(b);
      pending_delta = 0;
      if (ev == EV_END_OF_TRACK) return true;
    } else if (status == 0xF0 || status == 0xF7) {
      running_status = -1;
      uint32_t length = p.varlen();
      if (!p.ok || p.pos + length > end) return false;
      p.pos += length;
      out.type.push_back(EV_SYSEX);
      out.delta.push_back(pending_delta);
      out.channel.push_back(-1);
      out.a.push_back(0);
      out.b.push_back(0);
      pending_delta = 0;
    } else if (status >= 0xF1) {
      return false;
    } else {
      running_status = status;
      int kind = status & 0xF0;
      int channel = status & 0x0F;
      int32_t a = p.data_byte();
      int32_t b = 0;
      int32_t ev;
      switch (kind) {
        case 0x80: ev = EV_NOTE_OFF; b = p.data_byte(); break;
        case 0x90: ev = EV_NOTE_ON; b = p.data_byte(); break;
        case 0xA0: ev = EV_POLYTOUCH; b = p.data_byte(); break;
        case 0xB0: ev = EV_CONTROL; b = p.data_byte(); break;
        case 0xE0: {
          ev = EV_PITCHWHEEL;
          int32_t hi = p.data_byte();
          a = a | (hi << 7);
          break;
        }
        case 0xC0: ev = EV_PROGRAM; break;
        default: ev = EV_AFTERTOUCH; break;  // 0xD0
      }
      if (!p.ok) return false;
      out.type.push_back(ev);
      out.delta.push_back(pending_delta);
      out.channel.push_back(channel);
      out.a.push_back(a);
      out.b.push_back(b);
      pending_delta = 0;
    }
  }
  return p.ok;
}

}  // namespace

extern "C" {

// Opaque parse result. Track arrays are exposed by index.
struct MidiParseResult {
  int32_t format;
  int32_t ticks_per_beat;
  int32_t n_tracks;
  TrackData* tracks;
};

void midi_free_result(MidiParseResult* r);

// Returns nullptr on any malformed input (the Python side raises
// MidiParseError, matching the defensive-skip policy).
MidiParseResult* midi_parse(const uint8_t* data, size_t size) {
  Parser p(data, size);
  if (size < 14 || std::memcmp(data, "MThd", 4) != 0) return nullptr;
  p.pos = 4;
  uint32_t header_len = p.u32();
  if (!p.ok || header_len < 6) return nullptr;
  uint16_t fmt = p.u16();
  uint16_t ntracks = p.u16();
  uint16_t division = p.u16();
  if (!p.ok || (division & 0x8000) || division == 0) return nullptr;
  p.pos = 8 + header_len;

  auto* result = new (std::nothrow) MidiParseResult;
  if (!result) return nullptr;
  result->format = fmt;
  result->ticks_per_beat = division;
  result->n_tracks = ntracks;
  result->tracks = new (std::nothrow) TrackData[ntracks];
  if (!result->tracks) { delete result; return nullptr; }

  for (int t = 0; t < ntracks; ++t) {
    if (!p.avail(8) || std::memcmp(p.data + p.pos, "MTrk", 4) != 0) {
      midi_free_result(result);
      return nullptr;
    }
    p.pos += 4;
    uint32_t length = p.u32();
    if (!p.ok || p.pos + length > p.size) {
      midi_free_result(result);
      return nullptr;
    }
    size_t end = p.pos + length;
    if (!parse_track(p, end, result->tracks[t])) {
      midi_free_result(result);
      return nullptr;
    }
    p.pos = end;
  }
  return result;
}

void midi_free_result(MidiParseResult* r) {
  if (!r) return;
  delete[] r->tracks;
  delete r;
}

int32_t midi_result_format(MidiParseResult* r) { return r->format; }
int32_t midi_result_tpb(MidiParseResult* r) { return r->ticks_per_beat; }
int32_t midi_result_ntracks(MidiParseResult* r) { return r->n_tracks; }
int64_t midi_track_len(MidiParseResult* r, int32_t t) {
  return static_cast<int64_t>(r->tracks[t].type.size());
}
// Copies track t's arrays into caller-allocated buffers of midi_track_len size.
void midi_track_copy(MidiParseResult* r, int32_t t, int32_t* type,
                     int64_t* delta, int32_t* channel, int32_t* a, int32_t* b) {
  const TrackData& td = r->tracks[t];
  std::memcpy(type, td.type.data(), td.type.size() * sizeof(int32_t));
  std::memcpy(delta, td.delta.data(), td.delta.size() * sizeof(int64_t));
  std::memcpy(channel, td.channel.data(), td.channel.size() * sizeof(int32_t));
  std::memcpy(a, td.a.data(), td.a.size() * sizeof(int32_t));
  std::memcpy(b, td.b.data(), td.b.size() * sizeof(int32_t));
}

namespace {

void put_varlen(std::vector<uint8_t>& out, uint32_t value) {
  uint8_t chunks[4];
  int n = 0;
  chunks[n++] = value & 0x7F;
  value >>= 7;
  while (value) {
    chunks[n++] = 0x80 | (value & 0x7F);
    value >>= 7;
  }
  for (int i = n - 1; i >= 0; --i) out.push_back(chunks[i]);
}

}  // namespace

// Encodes one file. Track boundaries given by track_offsets (n_tracks+1
// entries into the flat event arrays). Returns a malloc'd buffer (caller
// frees with midi_free_buffer); size written to out_size. nullptr on error.
uint8_t* midi_encode(int32_t format, int32_t ticks_per_beat, int32_t n_tracks,
                     const int64_t* track_offsets, const int32_t* type,
                     const int64_t* delta, const int32_t* channel,
                     const int32_t* a, const int32_t* b, size_t* out_size) {
  static const int kStatus[7] = {0x80, 0x90, 0xA0, 0xB0, 0xC0, 0xD0, 0xE0};
  std::vector<uint8_t> out;
  out.reserve(1 << 16);
  const uint8_t header[8] = {'M', 'T', 'h', 'd', 0, 0, 0, 6};
  out.insert(out.end(), header, header + 8);
  auto push_u16 = [&out](uint16_t v) {
    out.push_back(v >> 8);
    out.push_back(v & 0xFF);
  };
  push_u16(format);
  push_u16(n_tracks);
  push_u16(ticks_per_beat);

  for (int t = 0; t < n_tracks; ++t) {
    out.insert(out.end(), {'M', 'T', 'r', 'k', 0, 0, 0, 0});
    size_t len_pos = out.size() - 4;
    size_t body_start = out.size();
    int running_status = -1;
    for (int64_t i = track_offsets[t]; i < track_offsets[t + 1]; ++i) {
      if (delta[i] < 0) return nullptr;
      put_varlen(out, static_cast<uint32_t>(delta[i]));
      int32_t ev = type[i];
      int32_t av = a[i], bv = b[i];
      if (ev >= EV_NOTE_OFF && ev <= EV_PITCHWHEEL) {
        int status = kStatus[ev] | (channel[i] & 0x0F);
        if (status != running_status) {
          out.push_back(status);
          running_status = status;
        }
        if (ev == EV_PITCHWHEEL) {
          out.push_back(av & 0x7F);
          out.push_back((av >> 7) & 0x7F);
        } else if (ev == EV_PROGRAM || ev == EV_AFTERTOUCH) {
          out.push_back(av);
        } else {
          out.push_back(av);
          out.push_back(bv);
        }
        continue;
      }
      running_status = -1;
      switch (ev) {
        case EV_TEMPO:
          out.insert(out.end(), {0xFF, 0x51, 3});
          out.push_back((av >> 16) & 0xFF);
          out.push_back((av >> 8) & 0xFF);
          out.push_back(av & 0xFF);
          break;
        case EV_TIME_SIG: {
          int pow2 = 0;
          while ((1 << pow2) < bv) ++pow2;
          if ((1 << pow2) != bv) return nullptr;
          out.push_back(0xFF); out.push_back(0x58); out.push_back(4);
          out.push_back(av); out.push_back(pow2);
          out.push_back(24); out.push_back(8);
          break;
        }
        case EV_KEY_SIG:
          out.push_back(0xFF); out.push_back(0x59); out.push_back(2);
          out.push_back(static_cast<uint8_t>(static_cast<int8_t>(av)));
          out.push_back(bv);
          break;
        case EV_END_OF_TRACK:
          out.push_back(0xFF); out.push_back(0x2F); out.push_back(0);
          break;
        default:
          return nullptr;  // cannot encode
      }
    }
    size_t body_len = out.size() - body_start;
    out[len_pos] = (body_len >> 24) & 0xFF;
    out[len_pos + 1] = (body_len >> 16) & 0xFF;
    out[len_pos + 2] = (body_len >> 8) & 0xFF;
    out[len_pos + 3] = body_len & 0xFF;
  }

  uint8_t* buffer = static_cast<uint8_t*>(std::malloc(out.size()));
  if (!buffer) return nullptr;
  std::memcpy(buffer, out.data(), out.size());
  *out_size = out.size();
  return buffer;
}

void midi_free_buffer(uint8_t* buffer) { std::free(buffer); }

}  // extern "C"
