// pvtio — native input-pipeline runtime for peft_vit_tpu.
//
// The reference feeds the GPU through torch DataLoader worker *processes*
// (PIL decode + torchvision transforms).  This is the TPU-side equivalent
// as a C++ library: libjpeg/libpng decode, fused bilinear
// resize-shorter-side + center-crop, base64 TSV shard reading, and a
// pthread-based prefetching batch loader handing zero-copy uint8 NHWC
// buffers to Python over ctypes (peft_vit_tpu/data/native.py).
//
// Everything returns plain C structs/arrays — no Python API dependency —
// so the same library can back other hosts (e.g. a future grain source).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <condition_variable>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// decode + resize + crop
// ---------------------------------------------------------------------------

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void jpegErrorExit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// decode JPEG bytes to RGB; returns malloc'd buffer (caller frees), sets w/h
static uint8_t* decode_jpeg(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  // volatile: modified after setjmp and read on the longjmp path
  uint8_t* volatile out = nullptr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpegErrorExit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    free((void*)out);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out = (uint8_t*)malloc((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return (uint8_t*)out;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

static void pngReadFn(png_structp png, png_bytep out, png_size_t n) {
  PngReadCtx* ctx = (PngReadCtx*)png_get_io_ptr(png);
  if (ctx->pos + n > ctx->len) n = ctx->len - ctx->pos;
  memcpy(out, ctx->data + ctx->pos, n);
  ctx->pos += n;
}

static uint8_t* decode_png(const uint8_t* data, size_t len, int* w, int* h) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return nullptr;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return nullptr;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return nullptr;
  }
  uint8_t* out = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    free(out);
    return nullptr;
  }
  PngReadCtx ctx{data, len, 0};
  png_set_read_fn(png, &ctx, pngReadFn);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out = (uint8_t*)malloc((size_t)(*w) * (*h) * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; y++) rows[y] = out + (size_t)y * (*w) * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return out;
}

// bilinear resize shorter side to `size`, center crop size x size, RGB u8.
// Matches the reference eval transform (Resize + CenterCrop;
// feature.py:516-530) up to the interpolation kernel (bilinear vs bicubic).
static void resize_center_crop_u8(const uint8_t* src, int sw, int sh,
                                  int size, uint8_t* dst) {
  const int shorter = sw < sh ? sw : sh;
  const double scale = (double)size / (double)shorter;
  const int nw = (int)(sw * scale + 0.5);
  const int nh = (int)(sh * scale + 0.5);
  const int left = (nw - size) / 2;
  const int top = (nh - size) / 2;
  for (int y = 0; y < size; y++) {
    const double sy = ((double)(y + top) + 0.5) / scale - 0.5;
    int y0 = (int)sy;
    double fy = sy - y0;
    if (y0 < 0) { y0 = 0; fy = 0; }
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    if (y0 > sh - 1) { y0 = sh - 1; fy = 0; }
    for (int x = 0; x < size; x++) {
      const double sx = ((double)(x + left) + 0.5) / scale - 0.5;
      int x0 = (int)sx;
      double fx = sx - x0;
      if (x0 < 0) { x0 = 0; fx = 0; }
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      if (x0 > sw - 1) { x0 = sw - 1; fx = 0; }
      for (int c = 0; c < 3; c++) {
        const double a = src[((size_t)y0 * sw + x0) * 3 + c];
        const double b = src[((size_t)y0 * sw + x1) * 3 + c];
        const double d = src[((size_t)y1 * sw + x0) * 3 + c];
        const double e = src[((size_t)y1 * sw + x1) * 3 + c];
        const double v = a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) +
                         d * (1 - fx) * fy + e * fx * fy;
        dst[((size_t)y * size + x) * 3 + c] = (uint8_t)(v + 0.5);
      }
    }
  }
}

// Public: decode (JPEG or PNG) + resize + center crop into out (size*size*3).
// Returns 0 on success.
int pvtio_decode_resize(const uint8_t* bytes, size_t len, int size,
                        uint8_t* out) {
  int w = 0, h = 0;
  uint8_t* rgb = decode_jpeg(bytes, len, &w, &h);
  if (!rgb) rgb = decode_png(bytes, len, &w, &h);
  if (!rgb) return -1;
  resize_center_crop_u8(rgb, w, h, size, out);
  free(rgb);
  return 0;
}

// ---------------------------------------------------------------------------
// base64
// ---------------------------------------------------------------------------

static const int8_t B64[256] = {
    // -1 everywhere except the 64 alphabet chars
#define X -1
    X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X, X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,
    X,X,X,X,X,X,X,X,X,X,X,62,X,X,X,63, 52,53,54,55,56,57,58,59,60,61,X,X,X,X,X,X,
    X,0,1,2,3,4,5,6,7,8,9,10,11,12,13,14, 15,16,17,18,19,20,21,22,23,24,25,X,X,X,X,X,
    X,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40, 41,42,43,44,45,46,47,48,49,50,51,X,X,X,X,X,
    X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X, X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,
    X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X, X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,
    X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X, X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,
    X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X, X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,X,
#undef X
};

// decode base64 in [src, src+len) into dst (must hold 3*len/4); returns bytes
size_t pvtio_b64_decode(const char* src, size_t len, uint8_t* dst) {
  size_t o = 0;
  int acc = 0, nbits = 0;
  for (size_t i = 0; i < len; i++) {
    const int8_t v = B64[(uint8_t)src[i]];
    if (v < 0) continue;  // skip '=', whitespace
    acc = (acc << 6) | v;
    nbits += 6;
    if (nbits >= 8) {
      nbits -= 8;
      dst[o++] = (uint8_t)((acc >> nbits) & 0xFF);
    }
  }
  return o;
}

// ---------------------------------------------------------------------------
// TSV shard loader with threaded prefetch
// ---------------------------------------------------------------------------

struct TsvSample {
  std::string path;   // shard file (raw mode: the image file itself)
  size_t offset;      // line start (raw mode: data offset)
  size_t length;      // line length (raw mode: byte count)
  int64_t label;
  // zip mode: 0 = stored (bytes are the image), 8 = deflate
  uint16_t method = 0;
};

struct Loader {
  std::vector<TsvSample> samples;
  int image_size;
  int batch;
  bool shuffle;
  uint64_t seed;
  int epoch = 0;
  // 0 = base64-TSV lines; 1 = whole-file image bytes (ImageFolder mode)
  int raw_mode = 0;

  // prefetch ring: batch b always lands in slot b % ring.size(), so the
  // consumer yields batches strictly in batch-index order (reproducible
  // seeded shuffle, partial batch last) even with num_threads > 1
  struct Slot {
    std::vector<uint8_t> x;
    std::vector<int64_t> y;
    int count = 0;
    bool ready = false;
  };
  std::vector<Slot> ring;
  size_t tail = 0;  // consumer reads tail (in batch order)
  std::mutex mu;
  std::condition_variable cv_prod, cv_cons;
  std::vector<std::thread> workers;
  std::vector<size_t> order;
  std::atomic<size_t> next_batch{0};
  size_t num_batches = 0;
  std::atomic<bool> stop{false};
};

static bool read_line(const TsvSample& s, std::string* out) {
  FILE* f = fopen(s.path.c_str(), "rb");
  if (!f) return false;
  if (fseek(f, (long)s.offset, SEEK_SET) != 0) {
    fclose(f);
    return false;
  }
  out->resize(s.length);
  size_t got = fread(out->data(), 1, s.length, f);
  fclose(f);
  out->resize(got);
  return got > 0;
}

static void decode_sample(const TsvSample& s, int raw_mode, int size,
                          uint8_t* out_x, int64_t* out_y) {
  std::string line;
  *out_y = s.label;
  memset(out_x, 0, (size_t)size * size * 3);
  if (!read_line(s, &line)) return;
  if (raw_mode) {
    if (s.method == 8) {
      // zip DEFLATE entry: inflate (raw, windowBits=-15) then decode
      z_stream zs;
      memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) return;
      std::vector<uint8_t> buf(line.size() * 4 + 4096);
      zs.next_in = (Bytef*)line.data();
      zs.avail_in = (uInt)line.size();
      int rc;
      size_t n = 0;
      do {
        if (n == buf.size()) buf.resize(buf.size() * 2);
        zs.next_out = buf.data() + n;
        zs.avail_out = (uInt)(buf.size() - n);
        rc = inflate(&zs, Z_NO_FLUSH);
        n = buf.size() - zs.avail_out;
        // keep going while input remains OR the output buffer filled
        // exactly (pending output can exist with avail_in == 0)
      } while (rc == Z_OK && (zs.avail_in > 0 || zs.avail_out == 0));
      inflateEnd(&zs);
      if (rc != Z_STREAM_END && rc != Z_OK) return;
      pvtio_decode_resize(buf.data(), n, size, out_x);
      return;
    }
    // the whole byte range is the compressed image
    pvtio_decode_resize((const uint8_t*)line.data(), line.size(), size,
                        out_x);
    return;
  }
  // columns: key \t base64 \t label
  size_t t1 = line.find('\t');
  if (t1 == std::string::npos) return;
  size_t t2 = line.find('\t', t1 + 1);
  if (t2 == std::string::npos) return;
  const char* b64 = line.data() + t1 + 1;
  size_t b64len = t2 - t1 - 1;
  std::vector<uint8_t> bytes(b64len * 3 / 4 + 4);
  size_t n = pvtio_b64_decode(b64, b64len, bytes.data());
  pvtio_decode_resize(bytes.data(), n, size, out_x);
}

static void worker_fn(Loader* L) {
  const size_t img_bytes = (size_t)L->image_size * L->image_size * 3;
  while (!L->stop.load()) {
    size_t b = L->next_batch.fetch_add(1);
    if (b >= L->num_batches) return;
    // slot index is fixed by the batch index; wait until the consumer has
    // drained the previous occupant of this slot (tail past b - ring size)
    size_t slot_idx = b % L->ring.size();
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_prod.wait(lk, [&] {
        return L->stop.load() || b < L->tail + L->ring.size();
      });
      if (L->stop.load()) return;
    }
    Loader::Slot& slot = L->ring[slot_idx];
    slot.count = 0;
    for (int i = 0; i < L->batch; i++) {
      size_t idx = b * L->batch + i;
      if (idx >= L->order.size()) break;
      const TsvSample& s = L->samples[L->order[idx]];
      decode_sample(s, L->raw_mode, L->image_size,
                    slot.x.data() + (size_t)i * img_bytes,
                    slot.y.data() + i);
      slot.count++;
    }
    {
      std::lock_guard<std::mutex> lk(L->mu);
      slot.ready = true;
    }
    L->cv_cons.notify_all();
  }
}

void* pvtio_loader_create(const char** shard_paths, int num_shards,
                          int image_size, int batch, int shuffle,
                          uint64_t seed, int num_threads, int ring_slots) {
  Loader* L = new Loader();
  L->image_size = image_size;
  L->batch = batch;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  // index all shards: record line offsets + labels
  for (int s = 0; s < num_shards; s++) {
    FILE* f = fopen(shard_paths[s], "rb");
    if (!f) continue;
    std::string path = shard_paths[s];
    std::string line;
    size_t offset = 0;
    int c;
    std::string cur;
    while ((c = fgetc(f)) != EOF) {
      cur.push_back((char)c);
      if (c == '\n') {
        // parse label = third column
        size_t t1 = cur.find('\t');
        size_t t2 = t1 == std::string::npos
                        ? std::string::npos
                        : cur.find('\t', t1 + 1);
        int64_t label = -1;
        if (t2 != std::string::npos)
          label = strtoll(cur.c_str() + t2 + 1, nullptr, 10);
        L->samples.push_back({path, offset, cur.size(), label});
        offset += cur.size();
        cur.clear();
      }
    }
    if (!cur.empty()) {
      size_t t1 = cur.find('\t');
      size_t t2 = t1 == std::string::npos ? std::string::npos
                                          : cur.find('\t', t1 + 1);
      int64_t label = -1;
      if (t2 != std::string::npos)
        label = strtoll(cur.c_str() + t2 + 1, nullptr, 10);
      L->samples.push_back({path, offset, cur.size(), label});
    }
    fclose(f);
  }
  const size_t img_bytes = (size_t)image_size * image_size * 3;
  if (ring_slots < 2) ring_slots = 2;
  L->ring.resize(ring_slots);
  for (auto& slot : L->ring) {
    slot.x.resize(img_bytes * batch);
    slot.y.resize(batch);
  }
  (void)num_threads;
  return L;
}

// ImageFolder mode: one sample per image file (the torchvision
// ImageFolder / reference DataLoader layout streamed natively).  The host
// enumerates the class-per-subdirectory tree (cheap metadata walk) and
// hands (file, label) pairs; decode runs in the worker threads.
void* pvtio_loader_create_files(const char** file_paths,
                                const int64_t* labels, int64_t n,
                                int image_size, int batch, int shuffle,
                                uint64_t seed, int num_threads,
                                int ring_slots) {
  Loader* L = new Loader();
  L->image_size = image_size;
  L->batch = batch;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  L->raw_mode = 1;
  // stat()+faccessat() (two fd-less syscalls) instead of fopen/fseek/
  // ftell/fclose: on >1M-file ImageFolder trees the open-per-file probe
  // added minutes of single-threaded startup before the first batch.
  // The readability probe keeps the old fopen semantics — an unreadable
  // file must be dropped at index time, not decoded to a zeroed image
  // at train time; AT_EACCESS checks with the EFFECTIVE uid like fopen
  // does (plain access() uses the real uid and diverges under setuid)
  for (int64_t i = 0; i < n; i++) {
    struct stat st;
    if (stat(file_paths[i], &st) != 0 || !S_ISREG(st.st_mode) ||
        st.st_size <= 0 ||
        faccessat(AT_FDCWD, file_paths[i], R_OK, AT_EACCESS) != 0)
      continue;
    L->samples.push_back({file_paths[i], 0, (size_t)st.st_size, labels[i]});
  }
  const size_t img_bytes = (size_t)image_size * image_size * 3;
  if (ring_slots < 2) ring_slots = 2;
  L->ring.resize(ring_slots);
  for (auto& slot : L->ring) {
    slot.x.resize(img_bytes * batch);
    slot.y.resize(batch);
  }
  (void)num_threads;
  return L;
}

// Zip-archive mode (ELEVATER / vision-datasets dumps pack images in
// zips): the host reads the zip directory once (python zipfile) and
// hands per-entry (data offset, compressed size, method, label); workers
// pread + inflate (deflate entries) + decode — the archive is never
// extracted.
void* pvtio_loader_create_zip(const char* zip_path, const uint64_t* offsets,
                              const uint64_t* sizes,
                              const uint16_t* methods,
                              const int64_t* labels, int64_t n,
                              int image_size, int batch, int shuffle,
                              uint64_t seed, int num_threads,
                              int ring_slots) {
  Loader* L = new Loader();
  L->image_size = image_size;
  L->batch = batch;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  L->raw_mode = 1;
  for (int64_t i = 0; i < n; i++) {
    L->samples.push_back({zip_path, (size_t)offsets[i], (size_t)sizes[i],
                          labels[i], methods[i]});
  }
  const size_t img_bytes = (size_t)image_size * image_size * 3;
  if (ring_slots < 2) ring_slots = 2;
  L->ring.resize(ring_slots);
  for (auto& slot : L->ring) {
    slot.x.resize(img_bytes * batch);
    slot.y.resize(batch);
  }
  (void)num_threads;
  return L;
}

int64_t pvtio_loader_num_samples(void* handle) {
  return (int64_t)((Loader*)handle)->samples.size();
}

// copy all sample labels into out (num_samples entries) — lets host-side
// samplers (class-aware / chunk) build custom orders without re-parsing
void pvtio_loader_labels(void* handle, int64_t* out) {
  Loader* L = (Loader*)handle;
  for (size_t i = 0; i < L->samples.size(); i++) out[i] = L->samples[i].label;
}

static void start_workers(Loader* L, int num_threads) {
  L->num_batches = (L->order.size() + L->batch - 1) / L->batch;
  L->next_batch.store(0);
  L->tail = 0;
  for (auto& slot : L->ring) slot.ready = false;
  if (num_threads < 1) num_threads = 1;
  for (int i = 0; i < num_threads; i++)
    L->workers.emplace_back(worker_fn, L);
}

static void join_workers(Loader* L) {
  // unblock producers stuck waiting for ring space (epoch abandoned
  // before being fully consumed), then join
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_prod.notify_all();
  for (auto& t : L->workers)
    if (t.joinable()) t.join();
  L->workers.clear();
  L->stop.store(false);
}

// start an epoch: shuffles the order and spins up workers
void pvtio_loader_start_epoch(void* handle, int epoch, int num_threads) {
  Loader* L = (Loader*)handle;
  join_workers(L);
  L->epoch = epoch;
  L->order.resize(L->samples.size());
  for (size_t i = 0; i < L->order.size(); i++) L->order[i] = i;
  if (L->shuffle) {
    std::mt19937_64 rng(L->seed + (uint64_t)epoch);
    std::shuffle(L->order.begin(), L->order.end(), rng);
  }
  start_workers(L, num_threads);
}

// start an epoch over an explicit sample order (host-side samplers /
// per-process shards); n may differ from num_samples (resampling)
void pvtio_loader_start_epoch_order(void* handle, const int64_t* order,
                                    int64_t n, int num_threads) {
  Loader* L = (Loader*)handle;
  join_workers(L);
  L->order.resize((size_t)n);
  const int64_t limit = (int64_t)L->samples.size();
  for (int64_t i = 0; i < n; i++) {
    int64_t v = order[i];
    L->order[(size_t)i] = (size_t)(v < 0 || v >= limit ? 0 : v);
  }
  start_workers(L, num_threads);
}

int64_t pvtio_loader_num_batches(void* handle) {
  return (int64_t)((Loader*)handle)->num_batches;
}

// blocking: copy the next ready batch into out_x/out_y; returns count or -1
int pvtio_loader_next(void* handle, uint8_t* out_x, int64_t* out_y) {
  Loader* L = (Loader*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->tail >= L->num_batches) return -1;
  size_t slot_idx = L->tail % L->ring.size();
  L->cv_cons.wait(lk, [&] {
    return L->stop.load() || L->ring[slot_idx].ready;
  });
  if (L->stop.load()) return -1;
  Loader::Slot& slot = L->ring[slot_idx];
  const size_t img_bytes = (size_t)L->image_size * L->image_size * 3;
  memcpy(out_x, slot.x.data(), img_bytes * (size_t)L->batch);
  memcpy(out_y, slot.y.data(), sizeof(int64_t) * (size_t)L->batch);
  int count = slot.count;
  slot.ready = false;
  L->tail++;
  lk.unlock();
  L->cv_prod.notify_all();
  return count;
}

void pvtio_loader_destroy(void* handle) {
  Loader* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_prod.notify_all();
  L->cv_cons.notify_all();
  for (auto& t : L->workers)
    if (t.joinable()) t.join();
  delete L;
}

}  // extern "C"
