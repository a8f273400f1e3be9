// Native streaming gzip source — the gz twin of the mmap'd plain-file
// scanner input (reference: src/utils.rs:147-157 [dep] opens plain or
// gz FASTQs via flate2; here the inflate runs on a dedicated NATIVE
// thread so it never contends with the Python serving loop for the GIL:
// the measured single-stream inflate cost (~25-60ms per 65k-read batch)
// must overlap the device step, and Python-thread handoff jitter was
// enough to drain the FIFO dispatch pipeline (PERF.md round 4)).
//
// Producer thread: fread -> inflate -> bounded block queue (byte-capped).
// Consumer (ctypes, GIL released): pa_gz_fill copies queued blocks into
// the caller's growable scan buffer and reports the end of the last
// complete line, mirroring the Python _GzScanBuffer contract.
//
// Multi-member gzip (bgzf-style concatenation) is handled by
// inflateReset after each member end.

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct PaGz {
  std::FILE* f = nullptr;
  std::thread th;
  std::mutex mu;
  std::condition_variable cv_data;   // producer -> consumer
  std::condition_variable cv_space;  // consumer -> producer
  std::deque<std::vector<uint8_t>> blocks;
  size_t front_off = 0;  // consumed prefix of blocks.front()
  size_t queued = 0;     // total unconsumed bytes across blocks
  size_t ahead_cap = 32u << 20;
  size_t chunk = 1u << 20;
  bool eof = false;              // producer finished (clean or error)
  std::atomic<bool> stop{false};  // consumer closed (read lock-free in run)
  int err = 0;
  char msg[160] = {0};

  void fail(const char* m) {
    std::lock_guard<std::mutex> g(mu);
    err = 1;
    snprintf(msg, sizeof(msg), "%s", m);
    eof = true;
    cv_data.notify_all();
  }

  void push(std::vector<uint8_t>&& block) {
    std::unique_lock<std::mutex> g(mu);
    cv_space.wait(g, [&] { return queued < ahead_cap || stop; });
    if (stop) return;
    queued += block.size();
    blocks.emplace_back(std::move(block));
    cv_data.notify_all();
  }

  void run() {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 31) != Z_OK) {
      fail("inflateInit2 failed");
      return;
    }
    std::vector<uint8_t> in(chunk);
    bool fed = false;  // bytes fed into the CURRENT member
    const size_t out_cap = chunk * 4;
    while (!stop) {
      size_t got = fread(in.data(), 1, chunk, f);
      if (got == 0) {
        if (ferror(f)) {
          fail("gzip source read error");
        } else if (fed) {
          // file ended mid-member: truncated stream
          fail("truncated gzip stream");
        } else {
          std::lock_guard<std::mutex> g(mu);
          eof = true;
          cv_data.notify_all();
        }
        break;
      }
      zs.next_in = in.data();
      zs.avail_in = (uInt)got;
      while (zs.avail_in > 0 && !stop) {
        fed = true;
        std::vector<uint8_t> out(out_cap);
        zs.next_out = out.data();
        zs.avail_out = (uInt)out.size();
        int rc = inflate(&zs, Z_NO_FLUSH);
        size_t produced = out.size() - zs.avail_out;
        if (produced) {
          out.resize(produced);
          // right-size before queueing: a bgzf-style file (~64KB per
          // member) would otherwise pin out_cap of heap per block while
          // `queued` counts only the bytes — ahead_cap admits hundreds
          if (out.capacity() > produced + 4096) out.shrink_to_fit();
          push(std::move(out));
        }
        if (rc == Z_STREAM_END) {
          // next gzip member (concatenated/bgzf files)
          if (inflateReset(&zs) != Z_OK) {
            fail("inflateReset failed");
            break;
          }
          fed = false;
        } else if (rc != Z_OK && rc != Z_BUF_ERROR) {
          fail(zs.msg ? zs.msg : "gzip inflate error");
          break;
        }
      }
      if (err) break;
    }
    inflateEnd(&zs);
    if (stop && !eof) {
      std::lock_guard<std::mutex> g(mu);
      eof = true;
      cv_data.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* pa_gz_open(const char* path, int64_t chunk, int64_t ahead_bytes) {
  PaGz* h = new PaGz();
  h->f = std::fopen(path, "rb");
  if (!h->f) {
    delete h;
    return nullptr;
  }
  if (chunk > 0) h->chunk = (size_t)chunk;
  if (ahead_bytes > 0) h->ahead_cap = (size_t)ahead_bytes;
  h->th = std::thread([h] { h->run(); });
  return h;
}

// Append queued decompressed bytes into dst[cur_len:cap] until
// (cur_len + appended) >= min_len, dst is full, or the stream ends.
// Outputs:
//   return        — bytes appended (>= 0), or -1 on stream error
//   *last_nl      — offset (within dst) ONE PAST the last '\n' in the
//                   appended region, or -1 if it contains none
//   *eof_out      — 1 iff the stream is exhausted AND all bytes consumed
//   errbuf        — error message on -1
int64_t pa_gz_fill(void* hv, uint8_t* dst, int64_t cap, int64_t cur_len,
                   int64_t min_len, int64_t* last_nl, int32_t* eof_out,
                   char* errbuf, int64_t errcap) {
  PaGz* h = (PaGz*)hv;
  int64_t appended = 0;
  *last_nl = -1;
  *eof_out = 0;
  std::unique_lock<std::mutex> g(h->mu);
  for (;;) {
    while (h->queued == 0 && !h->eof) h->cv_data.wait(g);
    // on error: deliver already-inflated bytes FIRST (matching the
    // Python fallback, whose queue holds chunks then the exception) —
    // the error is reported on the next call, once the queue is dry
    if (h->err && h->queued == 0) {
      if (appended > 0) break;
      snprintf(errbuf, (size_t)errcap, "%s", h->msg);
      return -1;
    }
    // drain as much as fits / is needed
    while (h->queued > 0 && cur_len + appended < cap) {
      std::vector<uint8_t>& blk = h->blocks.front();
      size_t avail = blk.size() - h->front_off;
      size_t space = (size_t)(cap - cur_len - appended);
      size_t take = avail < space ? avail : space;
      memcpy(dst + cur_len + appended, blk.data() + h->front_off, take);
      appended += (int64_t)take;
      h->front_off += take;
      h->queued -= take;
      if (h->front_off == blk.size()) {
        h->blocks.pop_front();
        h->front_off = 0;
      }
    }
    h->cv_space.notify_all();
    if (cur_len + appended >= min_len) break;
    if (cur_len + appended >= cap) break;  // caller must grow dst
    if (h->eof && h->queued == 0) break;
  }
  // never signal clean eof while an error is pending — the consumer
  // would treat the stream as complete and silently truncate
  if (h->eof && h->queued == 0 && !h->err) *eof_out = 1;
  if (appended > 0) {
    const uint8_t* beg = dst + cur_len;
    for (int64_t i = appended - 1; i >= 0; i--) {  // memrchr is GNU-only
      if (beg[i] == '\n') {
        *last_nl = cur_len + i + 1;
        break;
      }
    }
  }
  return appended;
}

void pa_gz_close(void* hv) {
  PaGz* h = (PaGz*)hv;
  {
    std::lock_guard<std::mutex> g(h->mu);
    h->stop = true;
    h->cv_space.notify_all();
    h->cv_data.notify_all();
  }
  if (h->th.joinable()) h->th.join();
  if (h->f) std::fclose(h->f);
  delete h;
}

}  // extern "C"
