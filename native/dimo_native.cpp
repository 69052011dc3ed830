// DIMO-TPU native runtime components (C++17, no external deps).
//
// The reference's runtime-native pieces outside the GPU kernels are its
// checkpoint IO (plyfile) and the multiprocess frame loader
// (utils/load_utils.py). Here both live in one small shared library driven
// through ctypes:
//
//   1. a binary float32 PLY codec (gaussian/control-point checkpoints are
//      written every 500 steps at ~100k points; parsing in C++ keeps the
//      host step loop from stalling);
//   2. an asynchronous batch packer: a worker thread gathers sampled
//      (motion, view, frame) uint8 frames from the in-RAM dataset into
//      contiguous batch buffers while the TPU executes the previous step
//      (double-buffered producer/consumer).
//
// Build: scripts/build_native.sh  ->  native/libdimo_native.so
// Python binding: dimo_tpu/io/native.py (ctypes; numpy fallback when the
// library is absent).

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

extern "C" {

// ---------------------------------------------------------------------------
// PLY codec (binary_little_endian, float32 properties only)

// names: n_props zero-terminated strings concatenated.
int ply_write_f32(const char* path, const char* names, int n_props,
                  const float* data, int64_t n_verts) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::string header = "ply\nformat binary_little_endian 1.0\n";
  header += "element vertex " + std::to_string((long long)n_verts) + "\n";
  const char* p = names;
  for (int i = 0; i < n_props; ++i) {
    header += "property float ";
    header += p;
    header += "\n";
    p += std::strlen(p) + 1;
  }
  header += "end_header\n";
  if (std::fwrite(header.data(), 1, header.size(), f) != header.size()) {
    std::fclose(f);
    return -2;
  }
  size_t total = (size_t)n_verts * n_props;
  size_t written = std::fwrite(data, sizeof(float), total, f);
  std::fclose(f);
  return written == total ? 0 : -3;
}

// Parse header: fills n_verts, n_props and writes property names into
// names_buf ('\n'-separated). Returns byte offset of the data section,
// or <0 on error (-4: non-float property => python fallback should parse).
int64_t ply_read_f32_header(const char* path, int64_t* n_verts, int* n_props,
                            char* names_buf, int names_buf_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string header;
  char line[512];
  int64_t offset = 0;
  bool is_binary_le = false;
  *n_verts = 0;
  *n_props = 0;
  int names_pos = 0;
  while (std::fgets(line, sizeof(line), f)) {
    offset += (int64_t)std::strlen(line);
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s == "end_header") {
      std::fclose(f);
      if (!is_binary_le) return -4;
      return offset;
    }
    if (s.rfind("format ", 0) == 0) {
      is_binary_le = s.find("binary_little_endian") != std::string::npos;
    } else if (s.rfind("element vertex ", 0) == 0) {
      *n_verts = std::strtoll(s.c_str() + 15, nullptr, 10);
    } else if (s.rfind("property ", 0) == 0) {
      if (s.rfind("property float ", 0) != 0) {
        std::fclose(f);
        return -4;  // non-float property: let python handle it
      }
      std::string name = s.substr(15);
      if (names_pos + (int)name.size() + 1 >= names_buf_len) {
        std::fclose(f);
        return -5;
      }
      std::memcpy(names_buf + names_pos, name.c_str(), name.size());
      names_pos += (int)name.size();
      names_buf[names_pos++] = '\n';
      (*n_props)++;
    }
  }
  std::fclose(f);
  return -2;  // no end_header
}

int ply_read_f32_data(const char* path, int64_t data_offset, float* out,
                      int64_t n_verts, int n_props) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, (long)data_offset, SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  size_t total = (size_t)n_verts * n_props;
  size_t got = std::fread(out, sizeof(float), total, f);
  std::fclose(f);
  return got == total ? 0 : -3;
}

// ---------------------------------------------------------------------------
// async batch packer

struct PackJob {
  std::vector<int64_t> frames;  // flat frame indices into the dataset
  uint8_t* out_img;
  uint8_t* out_mask;
};

struct Packer {
  const uint8_t* images;   // (F_total, img_bytes) row-major
  const uint8_t* masks;    // (F_total, mask_bytes)
  int64_t img_bytes;
  int64_t mask_bytes;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  std::queue<PackJob> jobs;
  int pending = 0;
  bool stop = false;

  void run() {
    for (;;) {
      PackJob job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop();
      }
      for (size_t i = 0; i < job.frames.size(); ++i) {
        int64_t fi = job.frames[i];
        std::memcpy(job.out_img + (int64_t)i * img_bytes,
                    images + fi * img_bytes, (size_t)img_bytes);
        std::memcpy(job.out_mask + (int64_t)i * mask_bytes,
                    masks + fi * mask_bytes, (size_t)mask_bytes);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        pending--;
      }
      cv_done.notify_all();
    }
  }
};

void* packer_create(const uint8_t* images, const uint8_t* masks,
                    int64_t img_bytes, int64_t mask_bytes) {
  Packer* p = new Packer();
  p->images = images;
  p->masks = masks;
  p->img_bytes = img_bytes;
  p->mask_bytes = mask_bytes;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

void packer_submit(void* handle, const int64_t* frame_indices, int b,
                   uint8_t* out_img, uint8_t* out_mask) {
  Packer* p = (Packer*)handle;
  PackJob job;
  job.frames.assign(frame_indices, frame_indices + b);
  job.out_img = out_img;
  job.out_mask = out_mask;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push(std::move(job));
    p->pending++;
  }
  p->cv_job.notify_one();
}

void packer_wait(void* handle) {
  Packer* p = (Packer*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->pending == 0; });
}

void packer_destroy(void* handle) {
  Packer* p = (Packer*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_job.notify_all();
  p->worker.join();
  delete p;
}

}  // extern "C"
