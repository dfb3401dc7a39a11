// Native clip loader: TFRecord(SequenceExample-of-JPEGs) -> uint8 clips.
//
// First-party C++ replacement for the tf.data hot path (the host-side
// bottleneck called out in SURVEY.md §7 "hard parts": per-frame JPEG
// decode of 16-frame clips).  Mirrors the reference pipeline semantics
// (reference dataloader.py:65-91 parse/decode, transforms.py:28-67
// temporal sampling, transforms.py:89-227 spatial transforms):
//
//   * streams GZIP TFRecord shards (zlib transparently handles plain
//     files too), walking tf.train.SequenceExample protos with a minimal
//     hand-rolled wire-format parser (no protobuf runtime dependency);
//   * decodes ONLY the temporally sampled frames (train: random start,
//     stride, modulo loop; eval: adaptive stride over V*T — bit-identical
//     index math to x3d_tpu.data.transforms.TemporalSampler);
//   * libjpeg DCT-domain 1/2^k prescaling to just above the target short
//     side, bilinear (half-pixel-centers, matching tf.image.resize)
//     resize, crop (random for train / center for eval), optional
//     horizontal flip (p=0.5, or always for the reference's replicated
//     flip bug);
//   * a worker pool: record reads are serialized (one compressed stream),
//     JPEG decode + resize run in parallel, finished samples flow through
//     a bounded queue.  Per-record RNG is derived from (seed, record
//     index), so results are independent of thread scheduling.
//
// Emits uint8 RGB — normalisation happens on the TPU (x3d_tpu/data/
// device.py), exactly like the tf.data path.  C ABI at the bottom;
// Python binding in x3d_tpu/data/native_loader.py (ctypes).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------- TFRecord I/O

// Streams TFRecords from shards.  Eval (shuffle=false): one shard at a
// time, in order — deterministic.  Train (shuffle=true): a two-level
// shuffle — shard order reshuffled per epoch AND each record drawn from
// one of up to kInterleave concurrently open shards picked uniformly at
// random (the analog of tf.data's nondeterministic parallel interleave,
// reference dataloader.py:153-159), so neighbouring output records come
// from different shards even before the sample-level reservoir in
// data/native_loader.py.  All picks ride one seeded RNG under the caller's
// reader lock, so output order is deterministic given the seed.
class RecordReader {
 public:
  static constexpr int kInterleave = 8;

  RecordReader(std::vector<std::string> paths, bool loop, bool shuffle,
               uint64_t seed)
      : paths_(std::move(paths)), loop_(loop), shuffle_(shuffle),
        rng_(seed ^ 0x9e3779b97f4a7c15ull) {
    if (shuffle_) std::shuffle(paths_.begin(), paths_.end(), rng_);
  }
  ~RecordReader() { close_all(); }

  // Returns false at end of data (only when loop == false).
  bool next(std::string* out, std::string* err) {
    const int want = shuffle_ ? kInterleave : 1;
    for (;;) {
      while (int(streams_.size()) < want && have_next_path()) {
        if (!open_next(err)) return false;
      }
      if (streams_.empty()) return false;  // end of data
      size_t i = streams_.size() == 1 ? 0 : rng_() % streams_.size();
      gzFile f = streams_[i].f;
      uint8_t hdr[12];
      int n = gzread(f, hdr, 12);
      if (n == 0) {  // clean EOF -> drop this stream, open the next shard
        gzclose(f);
        streams_.erase(streams_.begin() + ptrdiff_t(i));
        continue;
      }
      if (n != 12) {
        *err = "truncated record header in " + streams_[i].path;
        return false;
      }
      uint64_t len;
      std::memcpy(&len, hdr, 8);  // little-endian host assumed (x86/ARM)
      if (len > (1ull << 31)) {
        *err = "implausible record length";
        return false;
      }
      out->resize(len + 4);  // payload + trailing crc
      if (gzread(f, out->data(), static_cast<unsigned>(len + 4)) !=
          static_cast<int>(len + 4)) {
        *err = "truncated record payload in " + streams_[i].path;
        return false;
      }
      out->resize(len);
      return true;
    }
  }

 private:
  struct Stream {
    gzFile f;
    std::string path;
  };

  bool have_next_path() {
    if (next_ < paths_.size()) return true;
    if (!loop_ || paths_.empty()) return false;
    next_ = 0;
    epoch_++;
    if (shuffle_) std::shuffle(paths_.begin(), paths_.end(), rng_);
    return true;
  }

  bool open_next(std::string* err) {
    const std::string& p = paths_[next_++];
    gzFile f = gzopen(p.c_str(), "rb");
    if (!f) {
      *err = "cannot open " + p;
      return false;
    }
    gzbuffer(f, 1 << 20);
    streams_.push_back(Stream{f, p});
    return true;
  }
  void close_all() {
    for (auto& s : streams_) gzclose(s.f);
    streams_.clear();
  }

  std::vector<std::string> paths_;
  bool loop_, shuffle_;
  std::mt19937_64 rng_;
  size_t next_ = 0, epoch_ = 0;
  std::vector<Stream> streams_;
};

// ------------------------------------------------- SequenceExample parse

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
};

uint64_t ReadVarint(Cursor& c) {
  uint64_t v = 0;
  int shift = 0;
  while (c.p < c.end && shift < 64) {
    uint8_t b = *c.p++;
    v |= uint64_t(b & 0x7f) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
  }
  c.ok = false;
  return 0;
}

Cursor ReadLenDelim(Cursor& c) {
  uint64_t len = ReadVarint(c);
  if (!c.ok || c.p + len > c.end) {
    c.ok = false;
    return {c.p, c.p, false};
  }
  Cursor sub{c.p, c.p + len, true};
  c.p += len;
  return sub;
}

void SkipField(Cursor& c, uint32_t wire) {
  switch (wire) {
    case 0: ReadVarint(c); break;
    case 1: c.p += 8; break;
    case 2: ReadLenDelim(c); break;
    case 5: c.p += 4; break;
    default: c.ok = false;
  }
  if (c.p > c.end) c.ok = false;
}

struct FrameRef {
  const uint8_t* data;
  size_t size;
};

struct ParsedRecord {
  int64_t label = -1;
  int64_t num_frames = 0;
  std::vector<FrameRef> frames;  // views into the record buffer
};

int64_t ParseInt64Feature(Cursor f) {
  // Feature { int64_list = 3 { repeated int64 value = 1 } }
  while (f.ok && f.p < f.end) {
    uint64_t tag = ReadVarint(f);
    if (tag >> 3 == 3 && (tag & 7) == 2) {
      Cursor list = ReadLenDelim(f);
      while (list.ok && list.p < list.end) {
        uint64_t t2 = ReadVarint(list);
        if (t2 >> 3 == 1 && (t2 & 7) == 0) {
          return static_cast<int64_t>(ReadVarint(list));
        } else if (t2 >> 3 == 1 && (t2 & 7) == 2) {  // packed
          Cursor packed = ReadLenDelim(list);
          if (packed.ok && packed.p < packed.end)
            return static_cast<int64_t>(ReadVarint(packed));
        } else {
          SkipField(list, t2 & 7);
        }
      }
    } else {
      SkipField(f, tag & 7);
    }
  }
  return -1;
}

void ParseBytesFeature(Cursor f, std::vector<FrameRef>* out) {
  // Feature { bytes_list = 1 { repeated bytes value = 1 } }
  while (f.ok && f.p < f.end) {
    uint64_t tag = ReadVarint(f);
    if (tag >> 3 == 1 && (tag & 7) == 2) {
      Cursor list = ReadLenDelim(f);
      while (list.ok && list.p < list.end) {
        uint64_t t2 = ReadVarint(list);
        if (t2 >> 3 == 1 && (t2 & 7) == 2) {
          Cursor b = ReadLenDelim(list);
          if (list.ok) out->push_back({b.p, size_t(b.end - b.p)});
        } else {
          SkipField(list, t2 & 7);
        }
      }
    } else {
      SkipField(f, tag & 7);
    }
  }
}

bool KeyEquals(Cursor entry, const char* key, Cursor* value) {
  // map entry { key = 1 (string), value = 2 (message) }
  bool match = false;
  while (entry.ok && entry.p < entry.end) {
    uint64_t tag = ReadVarint(entry);
    if (tag >> 3 == 1 && (tag & 7) == 2) {
      Cursor k = ReadLenDelim(entry);
      match = (size_t(k.end - k.p) == std::strlen(key) &&
               std::memcmp(k.p, key, k.end - k.p) == 0);
    } else if (tag >> 3 == 2 && (tag & 7) == 2) {
      *value = ReadLenDelim(entry);
    } else {
      SkipField(entry, tag & 7);
    }
  }
  return match;
}

bool ParseSequenceExample(const std::string& rec, ParsedRecord* out,
                          std::string* err) {
  Cursor c{reinterpret_cast<const uint8_t*>(rec.data()),
           reinterpret_cast<const uint8_t*>(rec.data()) + rec.size(), true};
  while (c.ok && c.p < c.end) {
    uint64_t tag = ReadVarint(c);
    uint32_t field = tag >> 3, wire = tag & 7;
    if (field == 1 && wire == 2) {  // context: Features
      Cursor feats = ReadLenDelim(c);
      while (feats.ok && feats.p < feats.end) {
        uint64_t t2 = ReadVarint(feats);
        if (t2 >> 3 == 1 && (t2 & 7) == 2) {
          Cursor entry = ReadLenDelim(feats);
          Cursor value{nullptr, nullptr, false};
          if (KeyEquals(entry, "video/class/label", &value) && value.ok)
            out->label = ParseInt64Feature(value);
          else {
            Cursor v2{nullptr, nullptr, false};
            Cursor e2 = entry;
            if (KeyEquals(e2, "video/num_frames", &v2) && v2.ok)
              out->num_frames = ParseInt64Feature(v2);
          }
        } else {
          SkipField(feats, t2 & 7);
        }
      }
    } else if (field == 2 && wire == 2) {  // feature_lists
      Cursor lists = ReadLenDelim(c);
      while (lists.ok && lists.p < lists.end) {
        uint64_t t2 = ReadVarint(lists);
        if (t2 >> 3 == 1 && (t2 & 7) == 2) {
          Cursor entry = ReadLenDelim(lists);
          Cursor value{nullptr, nullptr, false};
          if (KeyEquals(entry, "video", &value) && value.ok) {
            // FeatureList { repeated Feature feature = 1 }
            while (value.ok && value.p < value.end) {
              uint64_t t3 = ReadVarint(value);
              if (t3 >> 3 == 1 && (t3 & 7) == 2)
                ParseBytesFeature(ReadLenDelim(value), &out->frames);
              else
                SkipField(value, t3 & 7);
            }
          }
        } else {
          SkipField(lists, t2 & 7);
        }
      }
    } else {
      SkipField(c, wire);
    }
  }
  if (!c.ok) {
    *err = "malformed SequenceExample";
    return false;
  }
  if (out->frames.empty()) {
    *err = "record has no 'video' frames";
    return false;
  }
  if (out->num_frames == 0) out->num_frames = int64_t(out->frames.size());
  return true;
}

// ------------------------------------------------------------ JPEG decode

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void JpegErrExit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// Decode with the largest 1/2^k DCT prescale whose short side stays
// >= min_short (0 = full size).
bool DecodeJpeg(const uint8_t* data, size_t size, int min_short, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrExit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_short > 0) {
    int short_side = std::min(cinfo.image_width, cinfo.image_height);
    int denom = 1;
    while (denom < 8 && short_side / (denom * 2) >= min_short) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------ resize / crop / flip

// Bilinear, half-pixel centers (tf.image.resize default geometry).
void ResizeBilinear(const Image& in, int ow, int oh, Image* out) {
  out->w = ow;
  out->h = oh;
  out->rgb.resize(size_t(ow) * oh * 3);
  const float sx = float(in.w) / ow, sy = float(in.h) / oh;
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> fx(ow);
  for (int x = 0; x < ow; ++x) {
    float src = (x + 0.5f) * sx - 0.5f;
    float fl = std::floor(src);
    int i0 = std::max(0, int(fl));
    int i1 = std::min(in.w - 1, i0 + 1);
    x0[x] = i0;
    x1[x] = i1;
    fx[x] = std::min(1.0f, std::max(0.0f, src - fl));
  }
  for (int y = 0; y < oh; ++y) {
    float src = (y + 0.5f) * sy - 0.5f;
    float fl = std::floor(src);
    int j0 = std::max(0, int(fl));
    int j1 = std::min(in.h - 1, j0 + 1);
    float fy = std::min(1.0f, std::max(0.0f, src - fl));
    const uint8_t* r0 = in.rgb.data() + size_t(j0) * in.w * 3;
    const uint8_t* r1 = in.rgb.data() + size_t(j1) * in.w * 3;
    uint8_t* dst = out->rgb.data() + size_t(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const uint8_t* a = r0 + x0[x] * 3;
      const uint8_t* b = r0 + x1[x] * 3;
      const uint8_t* cpx = r1 + x0[x] * 3;
      const uint8_t* d = r1 + x1[x] * 3;
      float wx = fx[x];
      for (int ch = 0; ch < 3; ++ch) {
        float top = a[ch] + (b[ch] - a[ch]) * wx;
        float bot = cpx[ch] + (d[ch] - cpx[ch]) * wx;
        // truncation matches the pipeline's uint8 cast convention
        dst[x * 3 + ch] = uint8_t(top + (bot - top) * fy);
      }
    }
  }
}

// ----------------------------------------------------------- the loader

struct Config {
  int num_frames = 16;
  int sample_rate = 5;
  int num_views = 1;       // eval temporal views; train always 1
  int num_crops = 1;       // eval spatial crops (1 = center, 3 = l/c/r)
  int is_training = 1;
  int jitter_min = 256;
  int jitter_max = 320;
  int crop_size = 224;
  int flip_mode = 1;       // 0 none, 1 random p=.5, 2 always (ref bug)
  uint64_t seed = 0;
  int num_threads = 4;
  int loop = 1;            // repeat (train)
  int shuffle = 1;
  int queue_capacity = 64;
};

struct Sample {
  std::vector<uint8_t> video;  // (clips*T, S, S, 3)
  int64_t label = -1;
};

class Loader {
 public:
  Loader(std::vector<std::string> paths, const Config& cfg)
      : cfg_(cfg),
        reader_(std::move(paths), cfg.loop != 0, cfg.shuffle != 0, cfg.seed) {
    int n = std::max(1, cfg_.num_threads);
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { WorkerLoop(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_pop_.notify_all();
    cv_push_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // 1 = sample written, 0 = end of data, -1 = error (see error()).
  int Next(uint8_t* video_out, int64_t* label_out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_pop_.wait(lk, [this] {
      return !queue_.empty() || done_workers_ == int(workers_.size()) ||
             !error_.empty();
    });
    if (!error_.empty()) return -1;
    if (queue_.empty()) return 0;
    Sample s = std::move(queue_.front());
    queue_.pop_front();
    cv_push_.notify_one();
    lk.unlock();
    std::memcpy(video_out, s.video.data(), s.video.size());
    *label_out = s.label;
    return 1;
  }

  size_t sample_bytes() const {
    int clips = cfg_.is_training ? 1 : cfg_.num_views * cfg_.num_crops;
    return size_t(clips) * cfg_.num_frames * cfg_.crop_size * cfg_.crop_size *
           3;
  }

  const std::string& error() const { return error_; }

 private:
  void WorkerLoop() {
    std::string rec, err;
    for (;;) {
      uint64_t idx;
      bool got;
      {
        std::lock_guard<std::mutex> lk(reader_mu_);
        got = reader_.next(&rec, &err);
        idx = record_idx_++;
      }
      if (!got) break;
      Sample s;
      if (!Process(rec, idx, &s, &err)) {
        std::lock_guard<std::mutex> lk(mu_);
        error_ = err.empty() ? "record processing failed" : err;
        cv_pop_.notify_all();
        return;
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_push_.wait(lk, [this] {
        return int(queue_.size()) < cfg_.queue_capacity || stop_;
      });
      if (stop_) return;
      queue_.push_back(std::move(s));
      cv_pop_.notify_one();
    }
    if (!err.empty()) {
      std::lock_guard<std::mutex> lk(mu_);
      error_ = err;
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_workers_++;
    }
    cv_pop_.notify_all();
  }

  bool Process(const std::string& rec, uint64_t idx, Sample* s,
               std::string* err) {
    ParsedRecord pr;
    if (!ParseSequenceExample(rec, &pr, err)) return false;
    const int T = cfg_.num_frames;
    const int V = cfg_.is_training ? 1 : cfg_.num_views;
    const int S = cfg_.crop_size;
    const int size = int(pr.frames.size());
    std::mt19937_64 rng(cfg_.seed * 0x2545F4914F6CDD1Dull + idx);

    // temporal indices — identical math to TemporalSampler.indices
    std::vector<int> indices(size_t(V) * T);
    if (cfg_.is_training) {
      int start = int(rng() % uint64_t(size));
      for (int k = 0; k < T; ++k)
        indices[k] = (start + k * cfg_.sample_rate) % size;
    } else {
      int rate = std::max(1, size / T);
      for (int k = 0; k < V * T; ++k) indices[k] = (k * rate) % size;
    }

    // spatial parameters, chosen once per record (per-clip consistent)
    int target_short;
    if (cfg_.is_training) {
      std::uniform_real_distribution<float> u(float(cfg_.jitter_min),
                                              float(cfg_.jitter_max));
      target_short = int(u(rng));
    } else {
      target_short = S;
    }
    bool flip = cfg_.flip_mode == 2 ||
                (cfg_.flip_mode == 1 && cfg_.is_training && (rng() & 1));

    s->video.assign(sample_bytes(), 0);
    s->label = pr.label;

    // decode each distinct frame once
    std::vector<int> order(indices.size());
    for (size_t i = 0; i < indices.size(); ++i) order[i] = int(i);
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return indices[a] < indices[b]; });

    Image full, resized;
    // crop offsets (cy, cx), fixed after the first decoded frame; eval
    // multi-crop follows the reference's uniform_crop (left/center/right
    // along the long side, ceil'd center offsets; crop-major output)
    std::vector<std::pair<int, int>> crops;
    int last = -1;
    const int n_crops = cfg_.is_training ? 1 : cfg_.num_crops;
    const int VT = int(indices.size());
    for (size_t oi = 0; oi < order.size(); ++oi) {
      int pos = order[oi];
      int fi = indices[pos];
      if (fi != last) {
        const FrameRef& fr = pr.frames[fi];
        if (!DecodeJpeg(fr.data, fr.size, target_short, &full)) {
          // reference fault-tolerance: undecodable video -> zero clip with
          // its label (dataloader.py:53-61); frames decoded before this
          // failure were already written, so re-zero the whole buffer
          s->video.assign(sample_bytes(), 0);
          return true;
        }
        // long side floors, like the pipeline's _short_side_resize
        // (transforms.py: tf.math.floor(h/w * size))
        int ow, oh;
        if (full.w <= full.h) {
          ow = target_short;
          oh = int(std::floor(double(full.h) / full.w * target_short));
        } else {
          oh = target_short;
          ow = int(std::floor(double(full.w) / full.h * target_short));
        }
        ResizeBilinear(full, ow, oh, &resized);
        if (crops.empty()) {
          int max_x = resized.w - S, max_y = resized.h - S;
          if (max_x < 0 || max_y < 0) {
            *err = "crop larger than resized frame";
            return false;
          }
          if (cfg_.is_training) {
            crops.emplace_back(
                max_y ? int(rng() % uint64_t(max_y + 1)) : 0,
                max_x ? int(rng() % uint64_t(max_x + 1)) : 0);
          } else {
            int ccy = (max_y + 1) / 2, ccx = (max_x + 1) / 2;
            bool tall = resized.h > resized.w;
            for (int i = 0; i < n_crops; ++i) {
              int idx = n_crops > 1 ? i % 3 : 1;
              int y = ccy, x = ccx;
              if (idx == 0) (tall ? y : x) = 0;
              if (idx == 2) (tall ? y = max_y : x = max_x);
              crops.emplace_back(y, x);
            }
          }
        }
        last = fi;
      }
      for (int ci = 0; ci < int(crops.size()); ++ci) {
        int cy = crops[ci].first, cx = crops[ci].second;
        uint8_t* dst =
            s->video.data() + (size_t(ci) * VT + pos) * S * S * 3;
        for (int y = 0; y < S; ++y) {
          const uint8_t* src =
              resized.rgb.data() + (size_t(cy + y) * resized.w + cx) * 3;
          if (!flip) {
            std::memcpy(dst + size_t(y) * S * 3, src, size_t(S) * 3);
          } else {
            uint8_t* drow = dst + size_t(y) * S * 3;
            for (int x = 0; x < S; ++x) {
              const uint8_t* px = src + (S - 1 - x) * 3;
              drow[x * 3] = px[0];
              drow[x * 3 + 1] = px[1];
              drow[x * 3 + 2] = px[2];
            }
          }
        }
      }
    }
    return true;
  }

  Config cfg_;
  RecordReader reader_;
  std::mutex reader_mu_;
  uint64_t record_idx_ = 0;

  std::mutex mu_;
  std::condition_variable cv_pop_, cv_push_;
  std::deque<Sample> queue_;
  bool stop_ = false;
  int done_workers_ = 0;
  std::string error_;
  std::vector<std::thread> workers_;
};

}  // namespace

// ------------------------------------------------------------------ C ABI

extern "C" {

void* x3d_loader_open(const char** paths, int num_paths, int num_frames,
                      int sample_rate, int num_views, int num_crops,
                      int is_training, int jitter_min, int jitter_max,
                      int crop_size, int flip_mode, unsigned long long seed,
                      int num_threads, int loop, int shuffle) {
  std::vector<std::string> p(paths, paths + num_paths);
  Config cfg;
  cfg.num_frames = num_frames;
  cfg.sample_rate = sample_rate;
  cfg.num_views = num_views;
  cfg.num_crops = num_crops;
  cfg.is_training = is_training;
  cfg.jitter_min = jitter_min;
  cfg.jitter_max = jitter_max;
  cfg.crop_size = crop_size;
  cfg.flip_mode = flip_mode;
  cfg.seed = seed;
  cfg.num_threads = num_threads;
  cfg.loop = loop;
  cfg.shuffle = shuffle;
  return new Loader(std::move(p), cfg);
}

int x3d_loader_next(void* handle, unsigned char* video, long long* label) {
  int64_t lab = 0;
  int rc = static_cast<Loader*>(handle)->Next(video, &lab);
  *label = static_cast<long long>(lab);
  return rc;
}

long long x3d_loader_sample_bytes(void* handle) {
  return static_cast<long long>(static_cast<Loader*>(handle)->sample_bytes());
}

const char* x3d_loader_error(void* handle) {
  return static_cast<Loader*>(handle)->error().c_str();
}

void x3d_loader_close(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
