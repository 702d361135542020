// Native data-loader runtime for the TPU TTS framework.
//
// The reference feeds training through a torch DataLoader with 8 persistent
// worker processes (vall_e/data.py:197-213).  This is the framework-native
// equivalent: a C++ worker pool that does the host-side heavy lifting of
// the data path off the GIL —
//   * .qnt.npy parsing (int16/int32 2-D arrays) straight from disk,
//   * speaker-balanced sampling (≡ vall_e/sampler.py: uniform over
//     speakers, then uniform over a speaker's utterances),
//   * prompt concatenation (1..max_prompts same-speaker utterances with
//     continuation probability p_additional_prompt, ≡ data.py:136-155),
//   * static-shape padded batch assembly (text/prom/resp + masks)
// with a bounded prefetch queue so batch assembly overlaps device steps.
//
// Exposed as a C ABI consumed via ctypes (native/loader.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Utterance {
  std::string qnt_path;
  std::vector<int32_t> phones;  // symmap ids incl. <s>/</s>
  int32_t spkr;
};

// ---------------------------------------------------------------- npy I/O

// Minimal .npy reader for little-endian int16/int32 2-D arrays
// ("(levels, t)" quant artifacts).  Returns false on malformed files.
bool load_npy_2d(const std::string& path, std::vector<int32_t>* out,
                 int64_t* rows, int64_t* cols) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[8];
  f.read(magic, 8);
  if (!f || std::memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  uint8_t major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t len16;
    f.read(reinterpret_cast<char*>(&len16), 2);
    header_len = len16;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  std::string header(header_len, '\0');
  f.read(header.data(), header_len);
  if (!f) return false;

  bool i2 = header.find("'<i2'") != std::string::npos ||
            header.find("'|i2'") != std::string::npos;
  bool i4 = header.find("'<i4'") != std::string::npos;
  bool i8 = header.find("'<i8'") != std::string::npos;
  if (!i2 && !i4 && !i8) return false;
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  auto sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  auto open = header.find('(', sp);
  auto close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) return false;
  std::string dims = header.substr(open + 1, close - open - 1);
  int64_t r = 0, c = 0;
  if (std::sscanf(dims.c_str(), "%ld, %ld", &r, &c) != 2 &&
      std::sscanf(dims.c_str(), "%ld,%ld", &r, &c) != 2)
    return false;

  const int64_t n = r * c;
  out->resize(n);
  if (i2) {
    std::vector<int16_t> tmp(n);
    f.read(reinterpret_cast<char*>(tmp.data()), n * 2);
    if (!f) return false;
    for (int64_t i = 0; i < n; ++i) (*out)[i] = tmp[i];
  } else if (i4) {
    f.read(reinterpret_cast<char*>(out->data()), n * 4);
    if (!f) return false;
  } else {
    std::vector<int64_t> tmp(n);
    f.read(reinterpret_cast<char*>(tmp.data()), n * 8);
    if (!f) return false;
    for (int64_t i = 0; i < n; ++i) (*out)[i] = static_cast<int32_t>(tmp[i]);
  }
  *rows = r;
  *cols = c;
  return true;
}

// ---------------------------------------------------------------- batches

struct Batch {
  std::vector<int32_t> text;       // (B, text_len)
  std::vector<float> text_mask;    // (B, text_len)
  std::vector<int32_t> proms;      // (B, prom_len, L)
  std::vector<float> prom_mask;    // (B, prom_len)
  std::vector<int32_t> resps;      // (B, resp_len, L)
  std::vector<float> resp_mask;    // (B, resp_len)
  std::vector<int64_t> indices;    // (B,) utterance index per row
};

struct Loader {
  // config
  int64_t batch_size, text_len, prom_len, resp_len, levels, max_prompts;
  double p_additional_prompt;
  int64_t queue_cap;

  std::vector<Utterance> utts;
  std::vector<int32_t> spkr_ids;                    // distinct speakers
  std::vector<std::vector<int64_t>> by_spkr;        // speaker -> utt indices

  // worker state
  std::vector<std::thread> workers;
  std::deque<Batch*> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<bool> stop{false};
  uint64_t seed;

  ~Loader() {
    stop.store(true);
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& w : workers) {
      if (w.joinable()) w.join();
    }
    for (auto* b : queue) delete b;
  }

  int64_t sample_utt(std::mt19937_64& rng) const {
    // speaker-balanced: uniform speaker, then uniform utterance
    std::uniform_int_distribution<size_t> ds(0, by_spkr.size() - 1);
    const auto& pool = by_spkr[ds(rng)];
    std::uniform_int_distribution<size_t> du(0, pool.size() - 1);
    return pool[du(rng)];
  }

  void fill_row(Batch* b, int64_t row, int64_t utt_idx, std::mt19937_64& rng) {
    const Utterance& u = utts[utt_idx];
    b->indices[row] = utt_idx;

    // text
    int64_t nt = std::min<int64_t>(u.phones.size(), text_len);
    std::memcpy(&b->text[row * text_len], u.phones.data(), nt * 4);
    for (int64_t i = 0; i < nt; ++i) b->text_mask[row * text_len + i] = 1.f;

    // resps
    std::vector<int32_t> q;
    int64_t L = 0, T = 0;
    if (load_npy_2d(u.qnt_path, &q, &L, &T)) {
      int64_t nr = std::min(T, resp_len);
      for (int64_t t = 0; t < nr; ++t) {
        for (int64_t l = 0; l < std::min(L, levels); ++l)
          b->resps[(row * resp_len + t) * levels + l] = q[l * T + t];
        b->resp_mask[row * resp_len + t] = 1.f;
      }
    }

    // prompts: other utterances of the same speaker, concatenated
    const auto& pool = by_spkr_lookup(u.spkr);
    int64_t filled = 0;
    std::uniform_real_distribution<double> ur(0.0, 1.0);
    for (int64_t p = 0; p < max_prompts && filled < prom_len; ++p) {
      int64_t other = utt_idx;
      if (pool.size() > 1) {
        std::uniform_int_distribution<size_t> du(0, pool.size() - 1);
        do {
          other = pool[du(rng)];
        } while (other == utt_idx);
      }
      std::vector<int32_t> pq;
      int64_t pL = 0, pT = 0;
      if (load_npy_2d(utts[other].qnt_path, &pq, &pL, &pT)) {
        int64_t n = std::min(pT, prom_len - filled);
        for (int64_t t = 0; t < n; ++t) {
          for (int64_t l = 0; l < std::min(pL, levels); ++l)
            b->proms[(row * prom_len + filled + t) * levels + l] =
                pq[l * pT + t];
          b->prom_mask[row * prom_len + filled + t] = 1.f;
        }
        filled += n;
      }
      if (ur(rng) > p_additional_prompt) break;
    }
  }

  const std::vector<int64_t>& by_spkr_lookup(int32_t spkr) const {
    return by_spkr[spkr];
  }

  Batch* make_batch(std::mt19937_64& rng) {
    auto* b = new Batch();
    b->text.assign(batch_size * text_len, 0);
    b->text_mask.assign(batch_size * text_len, 0.f);
    b->proms.assign(batch_size * prom_len * levels, 0);
    b->prom_mask.assign(batch_size * prom_len, 0.f);
    b->resps.assign(batch_size * resp_len * levels, 0);
    b->resp_mask.assign(batch_size * resp_len, 0.f);
    b->indices.assign(batch_size, 0);
    for (int64_t row = 0; row < batch_size; ++row)
      fill_row(b, row, sample_utt(rng), rng);
    return b;
  }

  void worker_main(uint64_t worker_seed) {
    std::mt19937_64 rng(worker_seed);
    while (!stop.load()) {
      Batch* b = make_batch(rng);
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] {
        return stop.load() || (int64_t)queue.size() < queue_cap;
      });
      if (stop.load()) {
        delete b;
        return;
      }
      queue.push_back(b);
      cv_pop.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// Construction is two-phase: create, add utterances, then start workers.
void* dl_create(int64_t batch_size, int64_t text_len, int64_t prom_len,
                int64_t resp_len, int64_t levels, int64_t max_prompts,
                double p_additional_prompt, uint64_t seed,
                int64_t queue_cap) {
  auto* l = new Loader();
  l->batch_size = batch_size;
  l->text_len = text_len;
  l->prom_len = prom_len;
  l->resp_len = resp_len;
  l->levels = levels;
  l->max_prompts = max_prompts;
  l->p_additional_prompt = p_additional_prompt;
  l->seed = seed;
  l->queue_cap = queue_cap;
  return l;
}

void dl_add_utterance(void* handle, const char* qnt_path,
                      const int32_t* phones, int64_t n_phones, int32_t spkr) {
  auto* l = static_cast<Loader*>(handle);
  Utterance u;
  u.qnt_path = qnt_path;
  u.phones.assign(phones, phones + n_phones);
  u.spkr = spkr;
  if (spkr >= (int32_t)l->by_spkr.size()) l->by_spkr.resize(spkr + 1);
  l->by_spkr[spkr].push_back((int64_t)l->utts.size());
  l->utts.push_back(std::move(u));
}

void dl_start(void* handle, int64_t n_workers) {
  auto* l = static_cast<Loader*>(handle);
  // prune empty speaker slots so sampling stays uniform over real speakers
  std::vector<std::vector<int64_t>> pruned;
  std::vector<int32_t> remap(l->by_spkr.size(), -1);
  for (size_t s = 0; s < l->by_spkr.size(); ++s) {
    if (!l->by_spkr[s].empty()) {
      remap[s] = (int32_t)pruned.size();
      pruned.push_back(l->by_spkr[s]);
    }
  }
  for (auto& u : l->utts) u.spkr = remap[u.spkr];
  l->by_spkr = std::move(pruned);
  for (int64_t w = 0; w < n_workers; ++w)
    l->workers.emplace_back(&Loader::worker_main, l, l->seed + 1000003 * w);
}

// Copy the next ready batch into caller-owned buffers.  Returns 0 on
// success, -1 if the loader is stopped.
int dl_next(void* handle, int32_t* text, float* text_mask, int32_t* proms,
            float* prom_mask, int32_t* resps, float* resp_mask,
            int64_t* indices) {
  auto* l = static_cast<Loader*>(handle);
  Batch* b = nullptr;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_pop.wait(lk, [&] { return l->stop.load() || !l->queue.empty(); });
    if (l->stop.load() && l->queue.empty()) return -1;
    b = l->queue.front();
    l->queue.pop_front();
    l->cv_push.notify_one();
  }
  std::memcpy(text, b->text.data(), b->text.size() * 4);
  std::memcpy(text_mask, b->text_mask.data(), b->text_mask.size() * 4);
  std::memcpy(proms, b->proms.data(), b->proms.size() * 4);
  std::memcpy(prom_mask, b->prom_mask.data(), b->prom_mask.size() * 4);
  std::memcpy(resps, b->resps.data(), b->resps.size() * 4);
  std::memcpy(resp_mask, b->resp_mask.data(), b->resp_mask.size() * 4);
  std::memcpy(indices, b->indices.data(), b->indices.size() * 8);
  delete b;
  return 0;
}

void dl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Standalone npy reader (used by tests and the Python fallback check).
int dl_load_npy(const char* path, int32_t* out, int64_t cap, int64_t* rows,
                int64_t* cols) {
  std::vector<int32_t> buf;
  if (!load_npy_2d(path, &buf, rows, cols)) return -1;
  if ((int64_t)buf.size() > cap) return -2;
  std::memcpy(out, buf.data(), buf.size() * 4);
  return 0;
}

}  // extern "C"
