// vvdata — native data plane for videovector_tpu.
//
// C++ equivalent of the reference's data-layer hot path (LMDB cursor read +
// protobuf parse + sampling + batch assembly running in a boost prefetch
// thread — ref:src/caffe/layers/video_sampled_shots_data_layer.cpp:768-909,
// base_data_layer.cpp:52-95). Provides:
//
//   * mmap'd VVR record-store reader (format: videovector_tpu/data/records.py)
//   * proto2 wire decoding of Datum / VideoShots float features
//   * the flagship WINDOW-context sampler with negative reservoir
//     (swap-percentage, key dedup) matching the Python reference
//     implementation in videovector_tpu/data/shots.py
//   * a background prefetch thread filling a bounded ring of ready batches
//
// Exposed as a C ABI for ctypes (videovector_tpu/data/native.py).
//
// Build: make -C native  (produces libvvdata.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <unordered_set>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#ifdef VV_WITH_JPEG
// libjpeg(-turbo) decode for the image data plane — the reference decodes
// in C++ too (OpenCV inside the prefetch thread,
// ref:src/caffe/util/io.cpp:69-88); PIL/cv2 stay as fallbacks.
#include <csetjmp>
#include <jpeglib.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// VVR reader
// ---------------------------------------------------------------------------

constexpr char kMagic[8] = {'V', 'V', 'R', 'E', 'C', '0', '0', '1'};

struct Entry {
  uint64_t offset;
  uint32_t length;
  std::string key;
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<Entry> entries;
};

void reader_close(Reader* r) {
  if (!r) return;
  if (r->base) munmap(const_cast<uint8_t*>(r->base), r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

// Every footer/index field is validated against the file size before use —
// the bytes are untrusted (a truncated or corrupt store must fail open, not
// walk the index out of the mapping) — and every failure path releases the
// mapping and fd (reader_close), so repeated probing of bad files cannot
// exhaust descriptors.
Reader* reader_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  if (st.st_size < 32) { ::close(fd); return nullptr; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) { ::close(fd); return nullptr; }
  auto* r = new Reader;
  r->fd = fd;
  r->base = static_cast<const uint8_t*>(mem);
  r->size = st.st_size;
  if (memcmp(r->base, kMagic, 8) != 0) { reader_close(r); return nullptr; }
  const uint8_t* foot = r->base + r->size - 24;
  uint64_t index_offset, count;
  memcpy(&index_offset, foot, 8);
  memcpy(&count, foot + 8, 8);
  if (memcmp(foot + 16, kMagic, 8) != 0) { reader_close(r); return nullptr; }
  const uint64_t index_end = r->size - 24;
  if (index_offset > index_end) { reader_close(r); return nullptr; }
  const uint8_t* p = r->base + index_offset;
  const uint8_t* pe = r->base + index_end;
  if (count > (index_end - index_offset) / 16) {  // min entry is 16 bytes
    reader_close(r);
    return nullptr;
  }
  r->entries.reserve(count);
  for (uint64_t i = 0; i < count; ++i) {
    if (p + 16 > pe) { reader_close(r); return nullptr; }
    Entry e;
    memcpy(&e.offset, p, 8);
    uint32_t len, klen;
    memcpy(&len, p + 8, 4);
    memcpy(&klen, p + 12, 4);
    if (klen > size_t(pe - p - 16)) { reader_close(r); return nullptr; }
    if (e.offset > index_offset || len > index_offset - e.offset) {
      reader_close(r);  // record span must lie inside the data region
      return nullptr;
    }
    e.length = len;
    e.key.assign(reinterpret_cast<const char*>(p + 16), klen);
    p += 16 + klen;
    r->entries.push_back(std::move(e));
  }
  return r;
}

// ---------------------------------------------------------------------------
// proto2 wire decode (subset: varint, LEN, I32) — field numbers per
// ref:src/caffe/proto/caffe.proto (Datum) and video_shot_sentences.proto
// ---------------------------------------------------------------------------

// Overflow-guarded varint: false on truncation or >10 continuation bytes
// (shift past 63 would be UB; the Python twin wire.read_varint raises at
// shift >= 70 — corrupt bytes must fail decode, not wrap silently).
inline bool read_varint(const uint8_t*& p, const uint8_t* end,
                        uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    if (shift < 64) v |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) { *out = v; return true; }
    shift += 7;
    if (shift >= 70) return false;
  }
  return false;  // ran off the buffer mid-varint
}

// Extract Datum.float_data (field 6; packed or unpacked) into out.
// Returns count written (capped at max_out), or -1 on corrupt/truncated
// bytes — every fixed-width read and LEN payload is bounds-checked against
// `end` (the record bytes come from untrusted DB files and sit in an mmap
// whose final page a wild read would run off).
int64_t datum_floats(const uint8_t* data, size_t len, float* out,
                     int64_t max_out) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  int64_t n = 0;
  uint64_t tag, blen, skip;
  while (p < end) {
    if (!read_varint(p, end, &tag)) return -1;
    uint32_t field = tag >> 3;
    uint32_t wt = tag & 7;
    if (field == 6 && wt == 5) {          // unpacked float
      if (p + 4 > end) return -1;
      if (n < max_out) memcpy(out + n, p, 4);
      ++n;
      p += 4;
    } else if (field == 6 && wt == 2) {   // packed floats
      if (!read_varint(p, end, &blen)) return -1;
      if (blen > uint64_t(end - p)) return -1;
      int64_t cnt = blen / 4;
      int64_t take = std::min(cnt, max_out - n);
      if (take > 0) memcpy(out + n, p, take * 4);
      n += cnt;
      p += blen;
    } else if (wt == 0) {
      if (!read_varint(p, end, &skip)) return -1;
    } else if (wt == 2) {
      if (!read_varint(p, end, &blen)) return -1;
      if (blen > uint64_t(end - p)) return -1;
      p += blen;
    } else if (wt == 5) {
      if (p + 4 > end) return -1;
      p += 4;
    } else if (wt == 1) {
      if (p + 8 > end) return -1;
      p += 8;
    } else {
      return -1;
    }
  }
  return n;
}

// VideoShots decode: video_id (field 1), shot_ids (2), shot_words (3, Datum)
struct VideoShotsView {
  int32_t video_id = 0;
  std::vector<int32_t> shot_ids;
  std::vector<std::pair<const uint8_t*, size_t>> shots;  // raw Datum spans
};

bool parse_video_shots(const uint8_t* data, size_t len, VideoShotsView* out) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  uint64_t tag, v, blen;
  while (p < end) {
    if (!read_varint(p, end, &tag)) return false;
    uint32_t field = tag >> 3;
    uint32_t wt = tag & 7;
    if (field == 1 && wt == 0) {
      if (!read_varint(p, end, &v)) return false;
      out->video_id = static_cast<int32_t>(v);
    } else if (field == 2 && wt == 0) {
      if (!read_varint(p, end, &v)) return false;
      out->shot_ids.push_back(static_cast<int32_t>(v));
    } else if (field == 2 && wt == 2) {   // packed ids
      if (!read_varint(p, end, &blen)) return false;
      if (blen > uint64_t(end - p)) return false;
      const uint8_t* q = p;
      const uint8_t* qe = p + blen;
      while (q < qe) {
        if (!read_varint(q, qe, &v)) return false;
        out->shot_ids.push_back(static_cast<int32_t>(v));
      }
      p += blen;
    } else if (field == 3 && wt == 2) {
      if (!read_varint(p, end, &blen)) return false;
      if (blen > uint64_t(end - p)) return false;
      out->shots.emplace_back(p, blen);
      p += blen;
    } else if (wt == 0) {
      if (!read_varint(p, end, &v)) return false;
    } else if (wt == 2) {
      if (!read_varint(p, end, &blen)) return false;
      if (blen > uint64_t(end - p)) return false;
      p += blen;
    } else if (wt == 5) {
      if (p + 4 > end) return false;
      p += 4;
    } else if (wt == 1) {
      if (p + 8 > end) return false;
      p += 8;
    } else {
      return false;
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Flagship WINDOW sampler (native twin of VideoSampledShotsSource)
// ---------------------------------------------------------------------------

struct Video {
  int32_t video_id;
  std::vector<int32_t> shot_ids;
  std::vector<float> features;   // (S, D) row-major
  int num_shots() const { return static_cast<int>(shot_ids.size()); }
};

struct SamplerConfig {
  int batch_size = 128;
  int context_size = 5;          // includes target (WINDOW semantics)
  int num_negatives = 10;
  int max_buffer_size = 5000;
  int swap_percentage = 50;
  int max_same_video_negs = 6;
  uint64_t seed = 1234;
};

struct Sampler {
  SamplerConfig cfg;
  std::vector<Video> videos;
  int feature_dim = 0;
  size_t cursor = 0;
  std::mt19937_64 rng;

  // reservoir
  std::vector<float> buffer;            // (max_buffer_size, D)
  std::vector<std::string> keys;
  std::unordered_set<std::string> key_set;

  // reservoir sampling scratch: a persistent permutation of buffer slots;
  // partial Fisher-Yates over it draws k DISTINCT slots per item (the
  // Python twin's rng.choice(replace=False) / the reference's
  // RandomShuffleTopids — independent uniform draws would repeat slots
  // and bias the ranking loss with duplicate negatives)
  std::vector<int> rsv_perm;

  // prefetch
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::deque<std::pair<std::vector<float>, std::vector<float>>> ready;
  size_t depth = 2;
  std::atomic<bool> stop{false};

  int channels() const { return cfg.context_size + cfg.num_negatives; }

  // Returns false when the dataset has too few distinct shots to fill the
  // reservoir — the reference CHECK-fails on underfill
  // (ref:src/caffe/layers/video_shot_window_data_layer.cpp:338
  // CHECK_EQ(num_negatives_added, max_buffer_size_)); the Python twin
  // raises, and vv_sampler_create returns null to match.
  bool fill_reservoir() {
    buffer.assign(size_t(cfg.max_buffer_size) * feature_dim, 0.f);
    int added = 0;
    size_t i = 0;
    size_t max_tries = size_t(cfg.max_buffer_size) * 100;
    while (added < cfg.max_buffer_size && i < max_tries) {
      const Video& v = videos[i % videos.size()];
      ++i;
      int s = std::uniform_int_distribution<int>(0, v.num_shots() - 1)(rng);
      std::string key = std::to_string(v.video_id) + ":" +
                        std::to_string(v.shot_ids[s]);
      if (key_set.count(key)) continue;
      memcpy(&buffer[size_t(added) * feature_dim],
             &v.features[size_t(s) * feature_dim], feature_dim * 4);
      keys.push_back(key);
      key_set.insert(key);
      ++added;
    }
    return added >= cfg.max_buffer_size;
  }

  void maybe_add(const std::string& key, const float* feat) {
    if (key_set.count(key)) return;
    if (std::uniform_int_distribution<int>(0, 99)(rng) < cfg.swap_percentage) {
      int slot = std::uniform_int_distribution<int>(
          0, cfg.max_buffer_size - 1)(rng);
      key_set.erase(keys[slot]);
      memcpy(&buffer[size_t(slot) * feature_dim], feat, feature_dim * 4);
      keys[slot] = key;
      key_set.insert(key);
    }
  }

  // one batch into out_data (B, C+N, D) and out_vids (B); false when
  // asked to stop (destroy must never deadlock on a spinning worker)
  bool next_batch(float* out_data, float* out_vids) {
    const int cs = cfg.context_size;
    const int half = cs / 2;
    const int D = feature_dim;
    int item = 0;
    std::vector<int> perm;
    while (item < cfg.batch_size) {
      if (stop.load(std::memory_order_relaxed)) return false;
      const Video& v = videos[cursor];
      cursor = (cursor + 1) % videos.size();
      const int S = v.num_shots();
      if (S < 2 || S < cs) continue;

      perm.resize(S);
      for (int i = 0; i < S; ++i) perm[i] = i;
      std::shuffle(perm.begin(), perm.end(), rng);
      std::sort(perm.begin(), perm.begin() + cs);

      float* row = out_data + size_t(item) * channels() * D;
      // target = middle of the sorted window
      memcpy(row, &v.features[size_t(perm[half]) * D], D * 4);
      int cidx = 1;
      for (int i = 0; i < cs; ++i) {
        if (i == half) continue;
        memcpy(row + size_t(cidx) * D, &v.features[size_t(perm[i]) * D], D * 4);
        ++cidx;
      }
      // same-video negatives: remaining ids outside [perm[half-1], perm[half+1]].
      // Cap by num_negatives too: the reference's loop bound is
      // max_same_video_negs alone (video_sampled_shots_data_layer.cpp:485)
      // and silently overruns the item's negative slots when
      // max_same_video_negs > num_negative_samples — here that would be
      // heap corruption, so the cap is the sane reading of the intent.
      int added = 0;
      const int same_cap = std::min(cfg.max_same_video_negs,
                                    cfg.num_negatives);
      if (cfg.num_negatives > 0 && S > cs && same_cap > 0) {
        std::shuffle(perm.begin() + cs, perm.end(), rng);
        int lo = perm[half - 1], hi = perm[half + 1];
        for (int i = cs; i < S && added < same_cap; ++i) {
          if (perm[i] < lo || perm[i] > hi) {
            memcpy(row + size_t(cs + added) * D,
                   &v.features[size_t(perm[i]) * D], D * 4);
            ++added;
          }
        }
      }
      // reservoir negatives: DISTINCT slots via partial Fisher-Yates
      // over the persistent slot permutation (need <= num_negatives <=
      // max_buffer_size, enforced at create)
      if (cfg.num_negatives > added) {
        int need = cfg.num_negatives - added;
        const int M = cfg.max_buffer_size;
        for (int k = 0; k < need; ++k) {
          int j = std::uniform_int_distribution<int>(k, M - 1)(rng);
          std::swap(rsv_perm[k], rsv_perm[j]);
          memcpy(row + size_t(cs + added + k) * D,
                 &buffer[size_t(rsv_perm[k]) * D], D * 4);
        }
      }
      out_vids[item] = static_cast<float>(v.video_id);
      ++item;
      // offer this video's shots to the reservoir
      if (cfg.num_negatives > 0 && cfg.swap_percentage > 0) {
        for (int s = 0; s < S; ++s) {
          maybe_add(std::to_string(v.video_id) + ":" +
                    std::to_string(v.shot_ids[s]),
                    &v.features[size_t(s) * D]);
        }
      }
    }
    return true;
  }

  void worker_loop() {
    const size_t dsz = size_t(cfg.batch_size) * channels() * feature_dim;
    for (;;) {
      std::vector<float> data(dsz);
      std::vector<float> vids(cfg.batch_size);
      if (!next_batch(data.data(), vids.data())) return;  // stop requested
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] { return stop.load() || ready.size() < depth; });
      if (stop.load()) return;
      ready.emplace_back(std::move(data), std::move(vids));
      cv_empty.notify_one();
    }
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// VVR writer (native twin of records.RecordWriter)
// ---------------------------------------------------------------------------

namespace {

struct Writer {
  FILE* f = nullptr;
  std::vector<Entry> index;
};

}  // namespace

extern "C" {

void* vvr_writer_open(const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  fwrite(kMagic, 1, 8, f);
  auto* w = new Writer;
  w->f = f;
  return w;
}

int vvr_writer_append(void* h, const char* key, int64_t key_len,
                      const uint8_t* value, int64_t value_len) {
  auto* w = static_cast<Writer*>(h);
  Entry e;
  e.offset = ftello(w->f);
  e.length = static_cast<uint32_t>(value_len);
  e.key.assign(key, key_len);
  if (fwrite(value, 1, value_len, w->f) != size_t(value_len)) return -1;
  w->index.push_back(std::move(e));
  return 0;
}

int vvr_writer_close(void* h) {
  auto* w = static_cast<Writer*>(h);
  uint64_t index_offset = ftello(w->f);
  for (const Entry& e : w->index) {
    uint32_t klen = e.key.size();
    fwrite(&e.offset, 8, 1, w->f);
    fwrite(&e.length, 4, 1, w->f);
    fwrite(&klen, 4, 1, w->f);
    fwrite(e.key.data(), 1, klen, w->f);
  }
  uint64_t count = w->index.size();
  fwrite(&index_offset, 8, 1, w->f);
  fwrite(&count, 8, 1, w->f);
  fwrite(kMagic, 1, 8, w->f);
  int rc = fclose(w->f);
  delete w;
  return rc;
}

void* vvr_open(const char* path) { return reader_open(path); }

void vvr_close(void* h) { reader_close(static_cast<Reader*>(h)); }

int64_t vvr_count(void* h) {
  return static_cast<Reader*>(h)->entries.size();
}

// value pointer + length for record i (zero-copy into the mmap).
// i is caller-supplied (an index store can carry any integer) — bounds-check
// it like every other untrusted input; NULL + len=-1 signals out of range.
const uint8_t* vvr_value(void* h, int64_t i, int64_t* len) {
  auto* r = static_cast<Reader*>(h);
  if (i < 0 || size_t(i) >= r->entries.size()) { *len = -1; return nullptr; }
  const Entry& e = r->entries[i];
  *len = e.length;
  return r->base + e.offset;
}

const char* vvr_key(void* h, int64_t i, int64_t* len) {
  auto* r = static_cast<Reader*>(h);
  if (i < 0 || size_t(i) >= r->entries.size()) { *len = -1; return nullptr; }
  const Entry& e = r->entries[i];
  *len = e.key.size();
  return e.key.data();
}

int64_t vv_datum_floats(const uint8_t* data, int64_t len, float* out,
                        int64_t max_out) {
  return datum_floats(data, len, out, max_out);
}

// Decode VideoShots: returns num shots; fills video_id, shot_ids (≤max_shots),
// features (num_shots × feature_dim, caller-sized).
int64_t vv_video_shots(const uint8_t* data, int64_t len, int32_t* video_id,
                       int32_t* shot_ids, float* features,
                       int64_t max_shots, int64_t feature_dim) {
  VideoShotsView view;
  if (!parse_video_shots(data, len, &view)) return -1;
  *video_id = view.video_id;
  int64_t n = std::min<int64_t>(view.shots.size(), max_shots);
  for (int64_t i = 0; i < n; ++i) {
    shot_ids[i] = i < (int64_t)view.shot_ids.size() ? view.shot_ids[i]
                                                    : static_cast<int32_t>(i);
    datum_floats(view.shots[i].first, view.shots[i].second,
                 features + i * feature_dim, feature_dim);
  }
  return n;
}

// Sampler lifecycle. Loads all VideoShots records from the VVR at `path`.
void* vv_sampler_create(const char* path, int batch_size, int context_size,
                        int num_negatives, int max_buffer_size,
                        int swap_percentage, int max_same_video_negs,
                        uint64_t seed, int prefetch_depth) {
  // config contracts, mirroring the Python twin's validation — an invalid
  // config must fail create, not index perm[-1] or construct a
  // uniform_int_distribution(0, -1) (UB) in the worker thread
  if (batch_size < 1 || context_size < 2 || num_negatives < 0 ||
      swap_percentage < 0 || swap_percentage > 99 ||
      (num_negatives > 0 && max_buffer_size < num_negatives)) {
    return nullptr;
  }
  Reader* r = reader_open(path);
  if (!r) return nullptr;
  auto* s = new Sampler;
  s->cfg = {batch_size, context_size, num_negatives, max_buffer_size,
            swap_percentage, max_same_video_negs, seed};
  s->rng.seed(seed);
  s->depth = prefetch_depth > 0 ? prefetch_depth : 2;
  for (size_t i = 0; i < r->entries.size(); ++i) {
    VideoShotsView view;
    const Entry& e = r->entries[i];
    if (!parse_video_shots(r->base + e.offset, e.length, &view)) continue;
    if (view.shots.empty()) continue;
    if (s->feature_dim == 0) {
      std::vector<float> probe(1 << 20);
      int64_t n = datum_floats(view.shots[0].first, view.shots[0].second,
                               probe.data(), probe.size());
      s->feature_dim = static_cast<int>(n);
    }
    Video v;
    v.video_id = view.video_id;
    v.features.resize(view.shots.size() * s->feature_dim);
    for (size_t k = 0; k < view.shots.size(); ++k) {
      v.shot_ids.push_back(k < view.shot_ids.size() ? view.shot_ids[k]
                                                    : static_cast<int32_t>(k));
      datum_floats(view.shots[k].first, view.shots[k].second,
                   &v.features[k * s->feature_dim], s->feature_dim);
    }
    s->videos.push_back(std::move(v));
  }
  reader_close(r);
  if (s->videos.empty()) { delete s; return nullptr; }
  // yieldability: at least one video must satisfy the WINDOW sampler's
  // S >= max(2, context_size) skip rule, or next_batch would spin forever
  // (the reference CHECK-fails on unusable datasets; so does the Python
  // twin after one full pass)
  bool any_yieldable = false;
  for (const Video& v : s->videos) {
    if (v.num_shots() >= 2 && v.num_shots() >= context_size) {
      any_yieldable = true;
      break;
    }
  }
  if (!any_yieldable) { delete s; return nullptr; }
  if (num_negatives > 0) {
    if (!s->fill_reservoir()) { delete s; return nullptr; }
    s->rsv_perm.resize(max_buffer_size);
    for (int i = 0; i < max_buffer_size; ++i) s->rsv_perm[i] = i;
  }
  s->worker = std::thread([s] { s->worker_loop(); });
  return s;
}

int vv_sampler_feature_dim(void* h) {
  return static_cast<Sampler*>(h)->feature_dim;
}

int vv_sampler_channels(void* h) {
  return static_cast<Sampler*>(h)->channels();
}

// Blocks until a prefetched batch is ready; copies into caller buffers.
int vv_sampler_next(void* h, float* out_data, float* out_vids) {
  auto* s = static_cast<Sampler*>(h);
  std::pair<std::vector<float>, std::vector<float>> batch;
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_empty.wait(lk,
                     [&] { return s->stop.load() || !s->ready.empty(); });
    if (s->stop.load()) return -1;
    batch = std::move(s->ready.front());
    s->ready.pop_front();
    s->cv_full.notify_one();
  }
  memcpy(out_data, batch.first.data(), batch.first.size() * 4);
  memcpy(out_vids, batch.second.data(), batch.second.size() * 4);
  return 0;
}

void vv_sampler_destroy(void* h) {
  auto* s = static_cast<Sampler*>(h);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->stop = true;
  }
  s->cv_full.notify_all();
  s->cv_empty.notify_all();
  if (s->worker.joinable()) s->worker.join();
  delete s;
}

// ---------------------------------------------------------------------------
// LevelDB interop hot paths: CRC32C + raw snappy decode.
// Pure-Python twins live in videovector_tpu/data/leveldbio.py; these keep
// bulk imports of reference databases at native speed (the reference links
// the real snappy/crc32c, Makefile.config).

// CRC-32C (Castagnoli, reflected 0x82f63b78), slicing-by-8.
static uint32_t g_crc_tables[8][256];
static bool g_crc_init = [] {
  for (uint32_t n = 0; n < 256; ++n) {
    uint32_t c = n;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ 0x82f63b78u : c >> 1;
    g_crc_tables[0][n] = c;
  }
  for (int t = 1; t < 8; ++t)
    for (uint32_t n = 0; n < 256; ++n)
      g_crc_tables[t][n] = g_crc_tables[0][g_crc_tables[t - 1][n] & 0xff] ^
                           (g_crc_tables[t - 1][n] >> 8);
  return true;
}();

uint32_t vv_crc32c(const uint8_t* p, int64_t n, uint32_t crc) {
  crc ^= 0xffffffffu;
  while (n >= 8) {
    uint64_t v;
    memcpy(&v, p, 8);
    crc ^= static_cast<uint32_t>(v);
    uint32_t hi = static_cast<uint32_t>(v >> 32);
    crc = g_crc_tables[7][crc & 0xff] ^ g_crc_tables[6][(crc >> 8) & 0xff] ^
          g_crc_tables[5][(crc >> 16) & 0xff] ^ g_crc_tables[4][crc >> 24] ^
          g_crc_tables[3][hi & 0xff] ^ g_crc_tables[2][(hi >> 8) & 0xff] ^
          g_crc_tables[1][(hi >> 16) & 0xff] ^ g_crc_tables[0][hi >> 24];
    p += 8;
    n -= 8;
  }
  while (n-- > 0) crc = (crc >> 8) ^ g_crc_tables[0][(crc ^ *p++) & 0xff];
  return crc ^ 0xffffffffu;
}

// Raw-format snappy decode (the leveldb block compression format).
// Returns the decompressed length, or -1 on corrupt input / short buffer.
int64_t vv_snappy_decompress(const uint8_t* in, int64_t in_len, uint8_t* out,
                             int64_t out_cap) {
  int64_t pos = 0;
  uint64_t ulen = 0;
  int shift = 0;
  while (true) {
    if (pos >= in_len) return -1;
    uint8_t b = in[pos++];
    if (shift < 64) ulen |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
    if (shift >= 70) return -1;  // corrupt preamble; << past 63 is UB
  }
  if (static_cast<int64_t>(ulen) > out_cap) return -1;
  int64_t o = 0;
  while (pos < in_len) {
    uint8_t tag = in[pos++];
    if ((tag & 3) == 0) {  // literal
      int64_t len = tag >> 2;
      if (len >= 60) {
        int nb = static_cast<int>(len) - 59;
        if (pos + nb > in_len) return -1;
        len = 0;
        for (int i = 0; i < nb; ++i)
          len |= static_cast<int64_t>(in[pos + i]) << (8 * i);
        pos += nb;
      }
      len += 1;
      if (pos + len > in_len || o + len > out_cap) return -1;
      memcpy(out + o, in + pos, len);
      pos += len;
      o += len;
      continue;
    }
    int64_t len, off;
    if ((tag & 3) == 1) {
      if (pos >= in_len) return -1;
      len = ((tag >> 2) & 7) + 4;
      off = (static_cast<int64_t>(tag >> 5) << 8) | in[pos++];
    } else if ((tag & 3) == 2) {
      if (pos + 2 > in_len) return -1;
      len = (tag >> 2) + 1;
      off = in[pos] | (static_cast<int64_t>(in[pos + 1]) << 8);
      pos += 2;
    } else {
      if (pos + 4 > in_len) return -1;
      len = (tag >> 2) + 1;
      off = in[pos] | (static_cast<int64_t>(in[pos + 1]) << 8) |
            (static_cast<int64_t>(in[pos + 2]) << 16) |
            (static_cast<int64_t>(in[pos + 3]) << 24);
      pos += 4;
    }
    if (off == 0 || off > o || o + len > out_cap) return -1;
    if (off >= len) {
      memcpy(out + o, out + o - off, len);
      o += len;
    } else {  // overlapping copy: byte-at-a-time run extension
      for (int64_t i = 0; i < len; ++i, ++o) out[o] = out[o - off];
    }
  }
  return (o == static_cast<int64_t>(ulen)) ? o : -1;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg-turbo): decode → BGR uint8 HWC at exactly
// (out_w, out_h). DCT prescale picks the smallest libjpeg M/8 scale whose
// output still covers the target (decode cost drops ~quadratically), then
// bilinear resample with cv2's INTER_LINEAR half-pixel convention
// (src = (dst + 0.5) * scale − 0.5) so values match the cv2 path within
// resampler rounding. out must hold out_h*out_w*3 bytes. out_w/out_h = 0
// decodes at natural size (caller reads dims via vv_jpeg_dims first).
// Returns 0 ok, -1 not built with jpeg, -2 corrupt stream.
// ---------------------------------------------------------------------------

int vv_jpeg_available() {
#ifdef VV_WITH_JPEG
  return 1;
#else
  return 0;
#endif
}

#ifdef VV_WITH_JPEG
namespace {
struct VVJpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf env;
};
void vv_jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<VVJpegErr*>(cinfo->err)->env, 1);
}
void vv_jpeg_silent(j_common_ptr, int) {}
}  // namespace
#endif

int vv_jpeg_dims(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h) {
#ifndef VV_WITH_JPEG
  (void)buf; (void)len; (void)w; (void)h;
  return -1;
#else
  jpeg_decompress_struct cinfo;
  VVJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = vv_jpeg_error_exit;
  jerr.pub.emit_message = vv_jpeg_silent;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *w = static_cast<int32_t>(cinfo.image_width);
  *h = static_cast<int32_t>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
#endif
}

int vv_decode_jpeg_bgr(const uint8_t* buf, int64_t len, int out_w, int out_h,
                       uint8_t* out) {
#ifndef VV_WITH_JPEG
  (void)buf; (void)len; (void)out_w; (void)out_h; (void)out;
  return -1;
#else
  jpeg_decompress_struct cinfo;
  VVJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = vv_jpeg_error_exit;
  jerr.pub.emit_message = vv_jpeg_silent;
  // volatile: modified between setjmp and a potential longjmp (corrupt
  // scan data mid-jpeg_read_scanlines) — without it the compiler may
  // register-allocate the pointer and longjmp restores the setjmp-time
  // value (leak) or garbage (wild delete), C11 7.13.2.1
  std::vector<uint8_t>* volatile tmp_holder = nullptr;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    delete tmp_holder;
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
#ifdef JCS_EXTENSIONS
  // libjpeg-turbo: decode straight to BGR — no per-pixel swap pass
  cinfo.out_color_space = JCS_EXT_BGR;
  const bool src_bgr = true;
#else
  cinfo.out_color_space = JCS_RGB;  // grayscale sources expand to RGB
  const bool src_bgr = false;
#endif
  if (out_w <= 0 || out_h <= 0) {
    out_w = static_cast<int>(cinfo.image_width);
    out_h = static_cast<int>(cinfo.image_height);
  }
  // DCT prescale: largest power-of-two downscale (1/2, 1/4, 1/8 — the
  // FAST scaled-IDCT paths; intermediate M/8 scales are slower than a
  // full decode in libjpeg-turbo) whose output still covers the target
  cinfo.scale_denom = 8;
  for (unsigned num : {1u, 2u, 4u, 8u}) {
    cinfo.scale_num = num;
    jpeg_calc_output_dimensions(&cinfo);
    if (static_cast<int>(cinfo.output_width) >= out_w &&
        static_cast<int>(cinfo.output_height) >= out_h)
      break;
  }
  jpeg_start_decompress(&cinfo);
  const int W = static_cast<int>(cinfo.output_width);
  const int H = static_cast<int>(cinfo.output_height);
  const int C = cinfo.output_components;  // 3 after BGR/RGB expansion
  const bool direct = (W == out_w && H == out_h && C == 3 && src_bgr);
  if (direct) {  // decode straight into the caller's buffer
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * W * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  tmp_holder = new std::vector<uint8_t>(static_cast<size_t>(W) * H * C);
  uint8_t* tmp = tmp_holder->data();
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = tmp + static_cast<size_t>(cinfo.output_scanline) * W * C;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // sc[c]: source channel for output channel c (out is BGR)
  int sc[3];
  if (C >= 3) {
    if (src_bgr) { sc[0] = 0; sc[1] = 1; sc[2] = 2; }
    else         { sc[0] = 2; sc[1] = 1; sc[2] = 0; }
  } else {
    sc[0] = sc[1] = sc[2] = 0;  // grayscale replicate
  }
  if (W == out_w && H == out_h) {  // no resample: channel-mapped copy
    for (int64_t i = 0; i < static_cast<int64_t>(out_w) * out_h; ++i) {
      out[i * 3 + 0] = tmp[i * C + sc[0]];
      out[i * 3 + 1] = tmp[i * C + sc[1]];
      out[i * 3 + 2] = tmp[i * C + sc[2]];
    }
    delete tmp_holder;
    return 0;
  }
  // fixed-point bilinear (cv2 INTER_LINEAR half-pixel convention),
  // x-taps precomputed once per row sweep: 15-bit weights, exact
  // rounding via +(1<<29) before the 30-bit shift
  const double sx = static_cast<double>(W) / out_w;
  const double sy = static_cast<double>(H) / out_h;
  // degenerate 1-pixel-wide/tall sources: the +1 bilinear taps must
  // replicate the single row/column instead of reading past the buffer
  const int dxC = (W > 1) ? C : 0;
  const size_t dyRow = (H > 1) ? static_cast<size_t>(W) * C : 0;
  std::vector<int> x0s(out_w);
  std::vector<int32_t> wxs(out_w);
  for (int x = 0; x < out_w; ++x) {
    double fx = (x + 0.5) * sx - 0.5;
    if (fx < 0) fx = 0;
    int x0 = static_cast<int>(fx);
    if (x0 > W - 2) x0 = W - 2;
    if (x0 < 0) x0 = 0;
    double wx = fx - x0;
    if (wx < 0) wx = 0;
    if (wx > 1) wx = 1;
    x0s[x] = x0;
    wxs[x] = static_cast<int32_t>(wx * 32768.0 + 0.5);
  }
  for (int y = 0; y < out_h; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > H - 2) y0 = H - 2;
    if (y0 < 0) y0 = 0;
    double wyd = fy - y0;
    if (wyd < 0) wyd = 0;
    if (wyd > 1) wyd = 1;
    const int32_t wy = static_cast<int32_t>(wyd * 32768.0 + 0.5);
    const uint8_t* r0 = tmp + static_cast<size_t>(y0) * W * C;
    const uint8_t* r1 = r0 + dyRow;
    uint8_t* orow = out + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const int x0 = x0s[x] * C;
      const int32_t wx = wxs[x];
      const int32_t w00 = (32768 - wy) * (32768 - wx);
      const int32_t w01 = (32768 - wy) * wx;
      const int32_t w10 = wy * (32768 - wx);
      const int32_t w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        const int s = x0 + sc[c];
        const int64_t v = static_cast<int64_t>(w00) * r0[s] +
                          static_cast<int64_t>(w01) * r0[s + dxC] +
                          static_cast<int64_t>(w10) * r1[s] +
                          static_cast<int64_t>(w11) * r1[s + dxC];
        orow[x * 3 + c] =
            static_cast<uint8_t>((v + (1 << 29)) >> 30);
      }
    }
  }
  delete tmp_holder;
  return 0;
#endif
}

}  // extern "C"
