// semi_audio: native audio IO + threaded prefetch pool for the data layer.
//
// The reference pipeline leaned on libsndfile/librosa for decode and a
// dedicated GPU for preprocessing (reference: data_c.py:129-133,
// multichannel.py:8). Here decode/resample run in a C++ thread pool off
// the Python GIL, feeding the JAX device-side mixer; RIR synthesis and
// augmentation stay on the TPU.
//
// Exposed C ABI (ctypes):
//   sa_wav_info(path, *sr, *channels, *frames)        -> 0 ok
//   sa_wav_read(path, out, max_frames, *sr)           -> frames read (mono f32)
//   sa_wav_write(path, data, frames, sr)              -> 0 ok
//   sa_resample(in, in_len, out, out_len, up, down)   -> 0 ok (polyphase sinc)
//   sa_pool_create(num_threads)                       -> pool id
//   sa_pool_submit(pool, job_id, path, target_sr)     -> 0 ok (async decode)
//   sa_pool_wait(pool, job_id, out, max_len)          -> samples (blocks)
//   sa_pool_destroy(pool)
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  int sample_rate = 0;
  int channels = 0;
  std::vector<float> samples;  // mono
};

#pragma pack(push, 1)
struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t format;
  uint16_t channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits;
};
#pragma pack(pop)

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  RiffHeader rh;
  if (std::fread(&rh, sizeof(rh), 1, f) != 1 ||
      std::memcmp(rh.riff, "RIFF", 4) != 0 ||
      std::memcmp(rh.wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  FmtChunk fmt{};
  bool have_fmt = false;
  std::vector<uint8_t> data;
  ChunkHeader ch;
  while (std::fread(&ch, sizeof(ch), 1, f) == 1) {
    if (std::memcmp(ch.id, "fmt ", 4) == 0) {
      uint32_t n = ch.size < sizeof(fmt) ? ch.size : sizeof(fmt);
      if (std::fread(&fmt, n, 1, f) != 1) break;
      if (ch.size > n) std::fseek(f, ch.size - n, SEEK_CUR);
      have_fmt = true;
    } else if (std::memcmp(ch.id, "data", 4) == 0) {
      data.resize(ch.size);
      if (ch.size && std::fread(data.data(), 1, ch.size, f) != ch.size) break;
    } else {
      std::fseek(f, (ch.size + 1) & ~1u, SEEK_CUR);
    }
  }
  std::fclose(f);
  if (!have_fmt || data.empty()) return false;

  const int chans = fmt.channels ? fmt.channels : 1;
  out->sample_rate = static_cast<int>(fmt.sample_rate);
  out->channels = chans;
  const size_t bytes_per = fmt.bits / 8;
  if (bytes_per == 0) return false;
  const size_t frames = data.size() / (bytes_per * chans);
  out->samples.resize(frames);

  // IEEE float (3) or PCM (1); mono-ize by taking channel 0 like the
  // reference reader (data_c.py read_wav -> first channel).
  const uint8_t* p = data.data();
  for (size_t i = 0; i < frames; ++i) {
    const uint8_t* s = p + i * bytes_per * chans;  // channel 0
    float v = 0.f;
    if (fmt.format == 3 && fmt.bits == 32) {
      std::memcpy(&v, s, 4);
    } else if (fmt.bits == 16) {
      int16_t x;
      std::memcpy(&x, s, 2);
      v = static_cast<float>(x) / 32768.f;
    } else if (fmt.bits == 32) {
      int32_t x;
      std::memcpy(&x, s, 4);
      v = static_cast<float>(x) / 2147483648.f;
    } else if (fmt.bits == 24) {
      int32_t x = (s[0] << 8) | (s[1] << 16) | (s[2] << 24);
      v = static_cast<float>(x >> 8) / 8388608.f;
    } else if (fmt.bits == 8) {
      v = (static_cast<float>(s[0]) - 128.f) / 128.f;
    }
    out->samples[i] = v;
  }
  return true;
}

// Polyphase windowed-sinc resampler matching semi_tpu/ops/resample.py
// (width=6 zero crossings, Hann window, rolloff 0.99).
void resample_poly(const float* in, int64_t in_len, float* out,
                   int64_t out_len, int up, int down) {
  const double rolloff = 0.99;
  const double cutoff = rolloff * 0.5 / std::max(up, down);
  const int half = static_cast<int>(std::ceil(6.0 / (2.0 * cutoff)));
  const int klen = 2 * half + 1;
  std::vector<double> kernel(klen);
  for (int n = -half; n <= half; ++n) {
    double sinc = (n == 0) ? 2.0 * cutoff
                           : std::sin(2.0 * M_PI * cutoff * n) / (M_PI * n);
    double win = 0.5 * (1.0 + std::cos(2.0 * M_PI * n / (klen + 1)));
    kernel[n + half] = up * sinc * win;
  }
  for (int64_t i = 0; i < out_len; ++i) {
    // output sample i sits at upsampled position i*down; kernel is
    // centered there (matching the conv's left pad of `half`).
    const int64_t center = i * down;
    double acc = 0.0;
    for (int t = -half; t <= half; ++t) {
      const int64_t pos = center + t;  // position at rate fs*up
      if (pos % up) continue;
      const int64_t j = pos / up;
      if (j < 0 || j >= in_len) continue;
      acc += kernel[t + half] * in[j];
    }
    out[i] = static_cast<float>(acc);
  }
}

struct Job {
  std::string path;
  int target_sr;
  std::vector<float> result;
  bool done = false;
  bool ok = false;
};

struct Pool {
  std::vector<std::thread> threads;
  std::deque<int64_t> queue;
  std::map<int64_t, std::shared_ptr<Job>> jobs;
  std::mutex mu;
  std::condition_variable cv_work;
  std::condition_variable cv_done;
  std::atomic<bool> stop{false};

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      threads.emplace_back([this] { worker(); });
    }
  }

  void worker() {
    for (;;) {
      std::shared_ptr<Job> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop) return;
        int64_t id = queue.front();
        queue.pop_front();
        job = jobs[id];
      }
      WavData wav;
      bool ok = read_wav(job->path.c_str(), &wav);
      if (ok && job->target_sr > 0 && wav.sample_rate != job->target_sr) {
        int g = 1;
        {
          int a = job->target_sr, b = wav.sample_rate;
          while (b) { int t = a % b; a = b; b = t; }
          g = a;
        }
        const int up = job->target_sr / g, down = wav.sample_rate / g;
        const int64_t out_len =
            (static_cast<int64_t>(wav.samples.size()) * up + down - 1) / down;
        std::vector<float> res(out_len);
        resample_poly(wav.samples.data(), wav.samples.size(), res.data(),
                      out_len, up, down);
        wav.samples.swap(res);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        job->ok = ok;
        if (ok) job->result.swap(wav.samples);
        job->done = true;
      }
      cv_done.notify_all();
    }
  }

  ~Pool() {
    stop = true;
    cv_work.notify_all();
    for (auto& t : threads) t.join();
  }
};

std::mutex g_pools_mu;
std::map<int64_t, std::unique_ptr<Pool>> g_pools;
int64_t g_next_pool = 1;

}  // namespace

extern "C" {

int sa_wav_info(const char* path, int* sr, int* channels, int64_t* frames) {
  WavData wav;
  if (!read_wav(path, &wav)) return -1;
  *sr = wav.sample_rate;
  *channels = wav.channels;
  *frames = static_cast<int64_t>(wav.samples.size());
  return 0;
}

int64_t sa_wav_read(const char* path, float* out, int64_t max_frames,
                    int* sr) {
  WavData wav;
  if (!read_wav(path, &wav)) return -1;
  *sr = wav.sample_rate;
  int64_t n = static_cast<int64_t>(wav.samples.size());
  if (n > max_frames) n = max_frames;
  std::memcpy(out, wav.samples.data(), n * sizeof(float));
  return n;
}

int sa_wav_write(const char* path, const float* data, int64_t frames,
                 int sr) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = static_cast<uint32_t>(frames * 2);
  RiffHeader rh{{'R', 'I', 'F', 'F'}, 36 + data_bytes, {'W', 'A', 'V', 'E'}};
  std::fwrite(&rh, sizeof(rh), 1, f);
  ChunkHeader fh{{'f', 'm', 't', ' '}, 16};
  std::fwrite(&fh, sizeof(fh), 1, f);
  FmtChunk fmt{1, 1, static_cast<uint32_t>(sr),
               static_cast<uint32_t>(sr * 2), 2, 16};
  std::fwrite(&fmt, sizeof(fmt), 1, f);
  ChunkHeader dh{{'d', 'a', 't', 'a'}, data_bytes};
  std::fwrite(&dh, sizeof(dh), 1, f);
  for (int64_t i = 0; i < frames; ++i) {
    float v = data[i];
    if (v > 1.f) v = 1.f;
    if (v < -1.f) v = -1.f;
    int16_t x = static_cast<int16_t>(v * 32767.f);
    std::fwrite(&x, 2, 1, f);
  }
  std::fclose(f);
  return 0;
}

int sa_resample(const float* in, int64_t in_len, float* out, int64_t out_len,
                int up, int down) {
  resample_poly(in, in_len, out, out_len, up, down);
  return 0;
}

int64_t sa_pool_create(int num_threads) {
  std::lock_guard<std::mutex> lk(g_pools_mu);
  int64_t id = g_next_pool++;
  g_pools[id] = std::make_unique<Pool>(num_threads);
  return id;
}

int sa_pool_submit(int64_t pool_id, int64_t job_id, const char* path,
                   int target_sr) {
  Pool* pool;
  {
    std::lock_guard<std::mutex> lk(g_pools_mu);
    auto it = g_pools.find(pool_id);
    if (it == g_pools.end()) return -1;
    pool = it->second.get();
  }
  auto job = std::make_shared<Job>();
  job->path = path;
  job->target_sr = target_sr;
  {
    std::lock_guard<std::mutex> lk(pool->mu);
    pool->jobs[job_id] = job;
    pool->queue.push_back(job_id);
  }
  pool->cv_work.notify_one();
  return 0;
}

int64_t sa_pool_wait(int64_t pool_id, int64_t job_id, float* out,
                     int64_t max_len) {
  Pool* pool;
  {
    std::lock_guard<std::mutex> lk(g_pools_mu);
    auto it = g_pools.find(pool_id);
    if (it == g_pools.end()) return -1;
    pool = it->second.get();
  }
  std::shared_ptr<Job> job;
  {
    std::unique_lock<std::mutex> lk(pool->mu);
    auto it = pool->jobs.find(job_id);
    if (it == pool->jobs.end()) return -1;
    job = it->second;
    pool->cv_done.wait(lk, [&] { return job->done; });
    pool->jobs.erase(job_id);
  }
  if (!job->ok) return -2;
  int64_t n = static_cast<int64_t>(job->result.size());
  if (n > max_len) n = max_len;
  std::memcpy(out, job->result.data(), n * sizeof(float));
  return n;
}

int sa_pool_destroy(int64_t pool_id) {
  std::lock_guard<std::mutex> lk(g_pools_mu);
  return g_pools.erase(pool_id) ? 0 : -1;
}

}  // extern "C"
