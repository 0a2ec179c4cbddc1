// libpivio — native I/O runtime for the TPU PIV framework.
//
// The reference feeds its accelerator with torch DataLoader worker processes
// (reference run.py:155, trainer.py:305-310). Here the host-side runtime is
// native: C-speed Middlebury .flo codecs, PGM/PPM image decode, and a
// pthread-pool batch loader that keeps a ring of decoded float32 NHWC batches
// ahead of the device feed. Exposed through a minimal C ABI consumed via
// ctypes (piv_liteflownet_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread pivio.cpp -o libpivio.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr float kFloTag = 202021.25f;

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<float> data;  // HWC, [0,1]
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = fread(out.data(), 1, out.size(), f);
  fclose(f);
  return got == out.size();
}

// ---------------------------------------------------------------- .flo codec
// Layout (reference src/utils_plot.py:120-158): f32 tag, i32 w, i32 h,
// f32[h*w*bands] raster.
int flo_read_impl(const char* path, float* out, int max_elems, int* h, int* w,
                  int bands) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf) || buf.size() < 12) return -1;
  float tag;
  memcpy(&tag, buf.data(), 4);
  if (tag != kFloTag) return -2;
  int32_t ww, hh;
  memcpy(&ww, buf.data() + 4, 4);
  memcpy(&hh, buf.data() + 8, 4);
  if (ww <= 0 || hh <= 0 || ww > 100000 || hh > 100000) return -3;
  size_t need = static_cast<size_t>(ww) * hh * bands;
  if (buf.size() < 12 + need * 4) return -4;
  *h = hh;
  *w = ww;
  if (out == nullptr) return 0;  // size query
  if (static_cast<size_t>(max_elems) < need) return -5;
  memcpy(out, buf.data() + 12, need * 4);
  return 0;
}

// ------------------------------------------------------------- PGM/PPM (P2/P5/P6)
bool decode_pnm(const uint8_t* buf, size_t n, Image& img) {
  if (n < 2 || buf[0] != 'P') return false;
  int type = buf[1] - '0';
  if (type != 2 && type != 5 && type != 6) return false;
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < n) {
      if (buf[pos] == '#') {
        while (pos < n && buf[pos] != '\n') pos++;
      } else if (isspace(buf[pos])) {
        pos++;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    bool any = false;
    while (pos < n && isdigit(buf[pos])) {
      v = v * 10 + (buf[pos++] - '0');
      any = true;
    }
    return any ? v : -1;
  };
  long w = read_int(), h = read_int(), maxval = read_int();
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535) return false;
  img.w = static_cast<int>(w);
  img.h = static_cast<int>(h);
  img.c = (type == 6) ? 3 : 1;
  size_t npx = static_cast<size_t>(w) * h * img.c;
  img.data.resize(npx);
  float inv = 1.0f / static_cast<float>(maxval);
  if (type == 2) {  // ascii gray
    for (size_t i = 0; i < npx; i++) {
      long v = read_int();
      if (v < 0) return false;
      img.data[i] = static_cast<float>(v) * inv;
    }
    return true;
  }
  pos++;  // single whitespace after maxval
  int bytes = maxval > 255 ? 2 : 1;
  if (n - pos < npx * bytes) return false;
  const uint8_t* p = buf + pos;
  if (bytes == 1) {
    for (size_t i = 0; i < npx; i++) img.data[i] = p[i] * inv;
  } else {  // big-endian 16-bit
    for (size_t i = 0; i < npx; i++)
      img.data[i] = static_cast<float>((p[2 * i] << 8) | p[2 * i + 1]) * inv;
  }
  return true;
}

bool load_image(const char* path, Image& img) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  return decode_pnm(buf.data(), buf.size(), img);
}

// -------------------------------------------------------------- batch loader
struct Batch {
  long index = -1;
  std::vector<float> data;  // [B, H, W, 3] x2 frames concatenated on axis 0? no:
                            // layout: [2, B, H, W, 3] (frame-major)
  int valid = 0;
};

struct Loader {
  std::vector<std::string> paths1, paths2;
  int batch = 1, h = 0, w = 0, threads = 2;
  std::atomic<long> next_batch{0};
  long n_batches = 0;

  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<Batch> ready;
  size_t max_queue = 4;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  long emit_next = 0;  // batches handed to python, in order
  std::vector<Batch> stash;  // out-of-order completed batches

  void worker() {
    while (!stop.load()) {
      long bi = next_batch.fetch_add(1);
      if (bi >= n_batches) return;
      Batch b;
      b.index = bi;
      size_t start = static_cast<size_t>(bi) * batch;
      size_t cnt = std::min<size_t>(batch, paths1.size() - start);
      b.valid = static_cast<int>(cnt);
      size_t frame = static_cast<size_t>(batch) * h * w * 3;
      b.data.assign(2 * frame, 0.0f);
      for (size_t k = 0; k < cnt; k++) {
        Image i1, i2;
        if (!load_image(paths1[start + k].c_str(), i1) ||
            !load_image(paths2[start + k].c_str(), i2))
          continue;
        auto put = [&](const Image& im, size_t off) {
          int hh = std::min(im.h, h), ww = std::min(im.w, w);
          for (int y = 0; y < hh; y++)
            for (int x = 0; x < ww; x++) {
              size_t dst = off + (k * static_cast<size_t>(h) * w + y * static_cast<size_t>(w) + x) * 3;
              if (im.c == 3) {
                const float* s = &im.data[(y * static_cast<size_t>(im.w) + x) * 3];
                b.data[dst] = s[0];
                b.data[dst + 1] = s[1];
                b.data[dst + 2] = s[2];
              } else {
                float v = im.data[y * static_cast<size_t>(im.w) + x];
                b.data[dst] = v;
                b.data[dst + 1] = v;
                b.data[dst + 2] = v;
              }
            }
        };
        put(i1, 0);
        put(i2, frame);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop.load(); });
      if (stop.load()) return;
      stash.push_back(std::move(b));
      // release in order
      bool moved = true;
      while (moved) {
        moved = false;
        for (size_t i = 0; i < stash.size(); i++) {
          if (stash[i].index == emit_next) {
            ready.push(std::move(stash[i]));
            stash.erase(stash.begin() + i);
            emit_next++;
            moved = true;
            break;
          }
        }
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int pivio_flo_read(const char* path, float* out, int max_elems, int* h, int* w,
                   int bands) {
  return flo_read_impl(path, out, max_elems, h, w, bands);
}

int pivio_flo_write(const char* path, const float* data, int h, int w, int bands) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int32_t ww = w, hh = h;
  fwrite(&kFloTag, 4, 1, f);
  fwrite(&ww, 4, 1, f);
  fwrite(&hh, 4, 1, f);
  size_t n = static_cast<size_t>(h) * w * bands;
  size_t wrote = fwrite(data, 4, n, f);
  fclose(f);
  return wrote == n ? 0 : -2;
}

// Decode a PGM/PPM into float32 RGB HWC [0,1]. Returns 0 on success;
// out==nullptr performs a size query filling h/w only.
int pivio_image_read(const char* path, float* out, int max_elems, int* h, int* w) {
  Image img;
  if (!load_image(path, img)) return -1;
  *h = img.h;
  *w = img.w;
  if (out == nullptr) return 0;
  size_t need = static_cast<size_t>(img.h) * img.w * 3;
  if (static_cast<size_t>(max_elems) < need) return -2;
  if (img.c == 3) {
    memcpy(out, img.data.data(), need * 4);
  } else {
    for (size_t i = 0; i < img.data.size(); i++) {
      out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = img.data[i];
    }
  }
  return 0;
}

void* pivio_loader_create(const char** paths1, const char** paths2, long n,
                          int batch, int h, int w, int threads) {
  auto* L = new Loader();
  L->paths1.assign(paths1, paths1 + n);
  L->paths2.assign(paths2, paths2 + n);
  L->batch = batch;
  L->h = h;
  L->w = w;
  L->threads = threads;
  L->n_batches = (n + batch - 1) / batch;
  for (int t = 0; t < threads; t++)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

long pivio_loader_batches(void* handle) {
  return static_cast<Loader*>(handle)->n_batches;
}

// Blocks for the next in-order batch; copies [2, B, H, W, 3] floats into out.
// Returns the number of valid pairs in the batch, or -1 when exhausted.
int pivio_loader_next(void* handle, float* out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  static thread_local long consumed = 0;  // not used; python tracks count
  if (L->ready.empty() && L->emit_next >= L->n_batches && L->stash.empty() &&
      L->next_batch.load() >= L->n_batches) {
    // may still be workers finishing; wait with predicate below
  }
  L->cv_ready.wait(lk, [&] { return !L->ready.empty() || L->stop.load(); });
  if (L->stop.load() && L->ready.empty()) return -1;
  Batch b = std::move(L->ready.front());
  L->ready.pop();
  L->cv_space.notify_all();
  lk.unlock();
  memcpy(out, b.data.data(), b.data.size() * 4);
  return b.valid;
}

void pivio_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
