// Async host-side trace writer.
//
// TPU-native replacement for the runtime role of the reference's persistent
// trace backends (pymc/backends/zarr.py writes chunks synchronously on the
// sampling thread). Here chunk persistence happens on a background C++
// thread: the Python driver enqueues a serialized chunk buffer and returns
// to the device loop immediately; writes land atomically (.tmp + rename) so
// a crash never leaves a torn chunk.
//
// Build: g++ -O3 -shared -fPIC -o libtrace_writer.so trace_writer.cc -lpthread
// Python binding: ctypes (see pymc_tpu/backends/native_writer.py).

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::string path;       // final path
  std::vector<char> data; // serialized payload
};

struct Writer {
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv;       // signals the worker: new job / stop
  std::condition_variable done_cv;  // signals waiters: a job finished
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<long> enqueued{0};
  std::atomic<long> written{0};
  std::atomic<long> errors{0};

  void finish(bool ok) {
    // Count completion under the lock so tw_flush's predicate check and its
    // wait cannot race with this update (no missed wakeups).
    {
      std::lock_guard<std::mutex> lock(mu);
      if (ok) {
        written.fetch_add(1);
      } else {
        errors.fetch_add(1);
      }
    }
    done_cv.notify_all();
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) return;
          continue;
        }
        job = std::move(queue.front());
        queue.pop_front();
      }
      // Dot-prefixed temp name so directory scans filtering on the final
      // chunk prefix (chunk_*.npz) never see an in-progress or crash-orphaned
      // partial file.
      std::string tmp;
      size_t slash = job.path.find_last_of('/');
      if (slash == std::string::npos) {
        tmp = "." + job.path + ".tmp";
      } else {
        tmp = job.path.substr(0, slash + 1) + "." + job.path.substr(slash + 1) +
              ".tmp";
      }
      FILE* f = std::fopen(tmp.c_str(), "wb");
      if (!f) {
        finish(false);
        continue;
      }
      size_t n = std::fwrite(job.data.data(), 1, job.data.size(), f);
      std::fflush(f);
      std::fclose(f);
      if (n != job.data.size() || std::rename(tmp.c_str(), job.path.c_str())) {
        std::remove(tmp.c_str());
        finish(false);
        continue;
      }
      finish(true);
    }
  }
};

}  // namespace

extern "C" {

void* tw_open() {
  Writer* w = new Writer();
  w->worker = std::thread([w] { w->run(); });
  return w;
}

// Enqueue a chunk: copies `nbytes` from `data`; returns queue depth.
long tw_write(void* handle, const char* path, const void* data, long nbytes) {
  Writer* w = static_cast<Writer*>(handle);
  Job job;
  job.path = path;
  job.data.resize(static_cast<size_t>(nbytes));
  std::memcpy(job.data.data(), data, static_cast<size_t>(nbytes));
  long depth;
  {
    std::lock_guard<std::mutex> lock(w->mu);
    w->enqueued.fetch_add(1);
    w->queue.push_back(std::move(job));
    depth = static_cast<long>(w->queue.size());
  }
  w->cv.notify_one();
  return depth;
}

// Block until every enqueued chunk has fully completed (written or errored) —
// not merely until the queue is empty, which would return while the worker is
// mid-write on the final chunk. Returns number of chunks written so far.
long tw_flush(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  std::unique_lock<std::mutex> lock(w->mu);
  w->done_cv.wait(lock, [&] {
    return w->written.load() + w->errors.load() == w->enqueued.load();
  });
  return w->written.load();
}

long tw_errors(void* handle) {
  return static_cast<Writer*>(handle)->errors.load();
}

void tw_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  tw_flush(handle);
  w->stop.store(true);
  w->cv.notify_all();
  if (w->worker.joinable()) w->worker.join();
  delete w;
}

}  // extern "C"
