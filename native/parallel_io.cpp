// Parallel file IO for the host data pipeline.
//
// The reference feeds its trainer from torch DataLoader worker *processes*
// (ref: trainer/trainer_base.py:126-135) mainly because np.load holds the GIL
// during disk reads. This library gives the single-process TPU pipeline a
// GIL-free fast path: a persistent pthread pool that preads many files (or
// file segments) concurrently into caller-provided buffers.
//
// C ABI (used from Python via ctypes):
//   pio_read_files(paths, n, offsets, sizes, dest_ptrs) -> 0 on success
//     reads sizes[i] bytes from paths[i] starting at offsets[i] into
//     dest_ptrs[i]; returns the index of the first failing file - 1... (<0).
//   pio_file_size(path) -> size in bytes or -1.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no external deps)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(4u, std::thread::hardware_concurrency()));
  return &p;
}

int read_one(const char* path, int64_t offset, int64_t size, char* dest) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  int64_t done = 0;
  while (done < size) {
    ssize_t got = pread(fd, dest + done, size - done, offset + done);
    if (got <= 0) {
      close(fd);
      return -1;
    }
    done += got;
  }
  close(fd);
  return 0;
}

}  // namespace

extern "C" {

int64_t pio_file_size(const char* path) {
  struct stat st;
  if (stat(path, &st) != 0) return -1;
  return static_cast<int64_t>(st.st_size);
}

// Reads n files concurrently. Returns 0 on success, or -(i+1) where i is the
// index of the first file that failed.
int pio_read_files(const char** paths, int n, const int64_t* offsets,
                   const int64_t* sizes, char** dests) {
  std::atomic<int> failed(-1);
  std::atomic<int> remaining(n);
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int i = 0; i < n; ++i) {
    pool()->submit([&, i] {
      if (read_one(paths[i], offsets[i], sizes[i], dests[i]) != 0) {
        int expected = -1;
        failed.compare_exchange_strong(expected, i);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  {
    std::unique_lock<std::mutex> lock(done_mu);
    done_cv.wait(lock, [&] { return remaining.load() == 0; });
  }
  int f = failed.load();
  return f < 0 ? 0 : -(f + 1);
}

}  // extern "C"
