// Native frame-preprocessing pipeline.
//
// The reference's data path (DatasetReader + PhotometricUndistorter +
// Undistort::undistort, src/util/Undistort.cpp:214-254 and :470+) is C++;
// this is the rebuild's native equivalent: gamma-LUT response removal,
// inverse-vignette multiplication and the precomputed bilinear remap are
// fused into one pass over the image, parallelized across a persistent
// worker pool, with an asynchronous prefetch queue so image preprocessing
// overlaps the SLAM pipeline (Python binds via ctypes; see native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libframe_pipeline.so \
//            frame_pipeline.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Pipeline {
  int w_in = 0, h_in = 0, w_out = 0, h_out = 0;
  std::vector<float> remap_x, remap_y;   // w_out*h_out, -1 = invalid
  std::vector<float> gamma_lut;          // 256 entries (G: raw -> irradiance)
  std::vector<float> vignette_inv;       // w_in*h_in (1.0 when absent)

  // worker pool
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  std::deque<std::function<void()>> jobs;
  std::atomic<int> inflight{0};
  bool stopping = false;

  explicit Pipeline(int n_threads) {
    for (int i = 0; i < n_threads; i++) {
      workers.emplace_back([this] { this->worker(); });
    }
  }

  ~Pipeline() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_job.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stopping || !jobs.empty(); });
        if (stopping && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      job();
      {
        // decrement-and-notify under mu: otherwise wait_all() can test its
        // predicate, miss the notify fired before it blocks, and hang
        std::lock_guard<std::mutex> lk(mu);
        if (--inflight == 0) cv_done.notify_all();
      }
    }
  }

  void submit(std::function<void()> f) {
    inflight++;
    {
      std::lock_guard<std::mutex> lk(mu);
      jobs.push_back(std::move(f));
    }
    cv_job.notify_one();
  }

  void wait_all() {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [this] { return inflight.load() == 0; });
  }

  // photometric correction into a scratch buffer, then remap
  void process_rows(const uint8_t* raw, float* corrected, int y0, int y1) const {
    const int w = w_in;
    for (int y = y0; y < y1; y++) {
      const uint8_t* src = raw + y * w;
      const float* vig = vignette_inv.data() + y * w;
      float* dst = corrected + y * w;
      for (int x = 0; x < w; x++) {
        dst[x] = gamma_lut[src[x]] * vig[x];
      }
    }
  }

  void remap_rows(const float* corrected, float* out, int y0, int y1) const {
    const int w = w_out;
    for (int y = y0; y < y1; y++) {
      for (int x = 0; x < w; x++) {
        const int idx = y * w + x;
        const float fx = remap_x[idx];
        const float fy = remap_y[idx];
        if (fx < 0 || fy < 0) {
          out[idx] = 0.0f;
          continue;
        }
        const int ix = (int)fx;
        const int iy = (int)fy;
        const float dx = fx - ix;
        const float dy = fy - iy;
        const int ix1 = ix + 1 < w_in ? ix + 1 : ix;
        const int iy1 = iy + 1 < h_in ? iy + 1 : iy;
        const float* c = corrected;
        const float v00 = c[iy * w_in + ix];
        const float v10 = c[iy * w_in + ix1];
        const float v01 = c[iy1 * w_in + ix];
        const float v11 = c[iy1 * w_in + ix1];
        out[idx] = v00 * (1 - dx) * (1 - dy) + v10 * dx * (1 - dy) +
                   v01 * (1 - dx) * dy + v11 * dx * dy;
      }
    }
  }
};

// ---- async prefetch slots -------------------------------------------------

struct Slot {
  std::vector<uint8_t> raw;
  std::vector<float> corrected;
  std::vector<float> out;
  std::atomic<int> state{0};  // 0 free, 1 queued, 2 done
};

struct Prefetcher {
  Pipeline* pipe;
  std::vector<Slot> slots;
  explicit Prefetcher(Pipeline* p, int n) : pipe(p), slots(n) {
    for (auto& s : slots) {
      s.raw.resize(p->w_in * p->h_in);
      s.corrected.resize(p->w_in * p->h_in);
      s.out.resize(p->w_out * p->h_out);
    }
  }
};

void run_process(Pipeline* p, const uint8_t* raw, float* corrected, float* out) {
  const int n_chunks = (int)p->workers.size();
  const int rows_in = (p->h_in + n_chunks - 1) / n_chunks;
  for (int c = 0; c < n_chunks; c++) {
    const int y0 = c * rows_in;
    const int y1 = std::min(p->h_in, y0 + rows_in);
    if (y0 >= y1) continue;
    p->submit([=] { p->process_rows(raw, corrected, y0, y1); });
  }
  p->wait_all();
  const int rows_out = (p->h_out + n_chunks - 1) / n_chunks;
  for (int c = 0; c < n_chunks; c++) {
    const int y0 = c * rows_out;
    const int y1 = std::min(p->h_out, y0 + rows_out);
    if (y0 >= y1) continue;
    p->submit([=] { p->remap_rows(corrected, out, y0, y1); });
  }
  p->wait_all();
}

}  // namespace

extern "C" {

void* fp_create(int w_in, int h_in, int w_out, int h_out,
                const float* remap_x, const float* remap_y,
                const float* gamma_lut, const float* vignette_inv,
                int n_threads) {
  auto* p = new Pipeline(n_threads > 0 ? n_threads : 4);
  p->w_in = w_in;
  p->h_in = h_in;
  p->w_out = w_out;
  p->h_out = h_out;
  p->remap_x.assign(remap_x, remap_x + (size_t)w_out * h_out);
  p->remap_y.assign(remap_y, remap_y + (size_t)w_out * h_out);
  p->gamma_lut.assign(gamma_lut, gamma_lut + 256);
  if (vignette_inv) {
    p->vignette_inv.assign(vignette_inv, vignette_inv + (size_t)w_in * h_in);
  } else {
    p->vignette_inv.assign((size_t)w_in * h_in, 1.0f);
  }
  return p;
}

void fp_destroy(void* h) { delete static_cast<Pipeline*>(h); }

// synchronous: raw u8 (h_in*w_in) -> out f32 (h_out*w_out)
void fp_process(void* h, const uint8_t* raw, float* out) {
  auto* p = static_cast<Pipeline*>(h);
  std::vector<float> corrected((size_t)p->w_in * p->h_in);
  run_process(p, raw, corrected.data(), out);
}

// -- async prefetch API -----------------------------------------------------

void* fp_prefetcher_create(void* pipeline, int n_slots) {
  return new Prefetcher(static_cast<Pipeline*>(pipeline),
                        n_slots > 0 ? n_slots : 4);
}

void fp_prefetcher_destroy(void* h) { delete static_cast<Prefetcher*>(h); }

// returns slot id, or -1 when no slot free
int fp_submit(void* h, const uint8_t* raw) {
  auto* pf = static_cast<Prefetcher*>(h);
  for (size_t i = 0; i < pf->slots.size(); i++) {
    Slot& s = pf->slots[i];
    int expected = 0;
    if (s.state.compare_exchange_strong(expected, 1)) {
      std::memcpy(s.raw.data(), raw, s.raw.size());
      Pipeline* p = pf->pipe;
      Slot* sp = &s;
      p->submit([p, sp] {
        // whole-frame job on one worker; pool-level parallelism comes from
        // multiple outstanding frames
        p->process_rows(sp->raw.data(), sp->corrected.data(), 0, p->h_in);
        p->remap_rows(sp->corrected.data(), sp->out.data(), 0, p->h_out);
        sp->state.store(2);
      });
      return (int)i;
    }
  }
  return -1;
}

// returns 1 and copies when done; 0 when still running
int fp_poll(void* h, int slot, float* out) {
  auto* pf = static_cast<Prefetcher*>(h);
  Slot& s = pf->slots[slot];
  if (s.state.load() != 2) return 0;
  std::memcpy(out, s.out.data(), s.out.size() * sizeof(float));
  s.state.store(0);
  return 1;
}

}  // extern "C"
