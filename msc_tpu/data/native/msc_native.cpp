// msc_tpu native data-plane helpers.
//
// TPU-native equivalents (SURVEY.md section 2.2) of the reference's
// third-party compiled hot spots:
//   * read_lidar_f32 : mmap'd nuScenes .bin reader, replacing
//     nuscenes-devkit LidarPointCloud.from_file (src/nuscenes_loader.py:146-157)
//   * dbscan        : grid-accelerated exact DBSCAN, host fallback for the
//     data-dependent clustering at src/agents/content_transform/lidar_agent.py:148-151
//     (the TPU path is the voxel connected-components kernel in
//     msc_tpu/ops/clustering.py).
//
// Built as a plain shared library, bound from Python via ctypes
// (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdio>
#include <vector>
#include <unordered_map>
#include <algorithm>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Read a nuScenes LIDAR_TOP .bin file: packed float32 records of
// (x, y, z, intensity, ring); we keep the first 4 channels.
// Returns the number of points written to `out` (rows of 4 floats),
// or -1 on error.  `max_points` caps the output.
int64_t read_lidar_f32(const char* path, float* out, int64_t max_points) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  const int64_t record = 5 * static_cast<int64_t>(sizeof(float));
  int64_t n = st.st_size / record;
  if (n > max_points) n = max_points;
  if (n == 0) { close(fd); return 0; }
  void* mem = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                   MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) { close(fd); return -1; }
  const float* src = static_cast<const float*>(mem);
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * 4, src + i * 5, 4 * sizeof(float));
  }
  munmap(mem, static_cast<size_t>(st.st_size));
  close(fd);
  return n;
}

namespace {

struct CellKey {
  int32_t x, y, z;
  bool operator==(const CellKey& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    // 3D spatial hash with large primes.
    return static_cast<size_t>(k.x) * 73856093u ^
           static_cast<size_t>(k.y) * 19349663u ^
           static_cast<size_t>(k.z) * 83492791u;
  }
};

}  // namespace

// Exact DBSCAN over 3D points using a uniform grid of cell size = eps.
// points: n x 3 float32 (row major).  labels: n int32 out; -1 = noise,
// clusters numbered from 0.  Returns the number of clusters.
int32_t dbscan(const float* points, int64_t n, float eps, int32_t min_samples,
               int32_t* labels) {
  if (n <= 0) return 0;
  const float eps2 = eps * eps;
  const float inv = 1.0f / eps;

  std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
  grid.reserve(static_cast<size_t>(n));
  std::vector<CellKey> keys(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    CellKey k{static_cast<int32_t>(std::floor(points[i * 3 + 0] * inv)),
              static_cast<int32_t>(std::floor(points[i * 3 + 1] * inv)),
              static_cast<int32_t>(std::floor(points[i * 3 + 2] * inv))};
    keys[static_cast<size_t>(i)] = k;
    grid[k].push_back(static_cast<int32_t>(i));
  }

  auto neighbors_of = [&](int64_t i, std::vector<int32_t>& out) {
    out.clear();
    const float px = points[i * 3 + 0];
    const float py = points[i * 3 + 1];
    const float pz = points[i * 3 + 2];
    const CellKey& c = keys[static_cast<size_t>(i)];
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          auto it = grid.find(CellKey{c.x + dx, c.y + dy, c.z + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            const float ddx = points[j * 3 + 0] - px;
            const float ddy = points[j * 3 + 1] - py;
            const float ddz = points[j * 3 + 2] - pz;
            if (ddx * ddx + ddy * ddy + ddz * ddz <= eps2) out.push_back(j);
          }
        }
  };

  std::fill(labels, labels + n, -2);  // -2 = unvisited
  int32_t cluster = 0;
  std::vector<int32_t> seeds, nbrs;
  seeds.reserve(1024);
  nbrs.reserve(1024);

  for (int64_t i = 0; i < n; ++i) {
    if (labels[i] != -2) continue;
    neighbors_of(i, nbrs);
    if (static_cast<int32_t>(nbrs.size()) < min_samples) {
      labels[i] = -1;  // noise (may be claimed by a cluster later)
      continue;
    }
    const int32_t cid = cluster++;
    labels[i] = cid;
    seeds.assign(nbrs.begin(), nbrs.end());
    for (size_t s = 0; s < seeds.size(); ++s) {
      const int32_t q = seeds[s];
      if (labels[q] == -1) labels[q] = cid;  // border point
      if (labels[q] != -2) continue;
      labels[q] = cid;
      neighbors_of(q, nbrs);
      if (static_cast<int32_t>(nbrs.size()) >= min_samples) {
        seeds.insert(seeds.end(), nbrs.begin(), nbrs.end());
      }
    }
  }
  return cluster;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG decode (SURVEY.md section 2.2 row 1: host C++ decode feeding the
// fused device resize/normalize kernel).  Replaces PIL's per-frame decode
// (src/nuscenes_loader.py:136-144): libjpeg with DCT scaling
// (scale_denom in {1,2,4,8}) decodes AND coarsely downscales in one pass,
// and decode_jpeg_batch fans the 6 camera frames out over threads
// (threaded sample assembly).  Compiled only when <jpeglib.h> exists;
// callers probe has_jpeg() and fall back to PIL.
// ---------------------------------------------------------------------------

#if __has_include(<jpeglib.h>)

#include <csetjmp>
#include <thread>
#include <cstdio>
#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(e->jump, 1);
}

// Decode one file into `out` (row-major RGB u8, capacity max_h*max_w*3).
// Writes decoded dims to *h/*w.  Returns 0 ok, -1 error.
int decode_one(const char* path, uint8_t* out, int32_t* h, int32_t* w,
               int32_t max_h, int32_t max_w, int32_t scale_denom) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = (scale_denom == 2 || scale_denom == 4 ||
                       scale_denom == 8) ? scale_denom : 1;
  jpeg_start_decompress(&cinfo);
  const int32_t oh = static_cast<int32_t>(cinfo.output_height);
  const int32_t ow = static_cast<int32_t>(cinfo.output_width);
  if (oh > max_h || ow > max_w || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<int64_t>(cinfo.output_scanline) * ow * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *h = oh;
  *w = ow;
  return 0;
}

}  // namespace

extern "C" {

int32_t has_jpeg() { return 1; }

int32_t decode_jpeg_file(const char* path, uint8_t* out, int32_t* h,
                         int32_t* w, int32_t max_h, int32_t max_w,
                         int32_t scale_denom) {
  return decode_one(path, out, h, w, max_h, max_w, scale_denom);
}

// paths: n zero-terminated strings back to back.  out: n frames of
// max_h*max_w*3 (each frame's decoded dims land in hs[i]/ws[i]).
// Returns the number of successful decodes (failed frames get hs[i] = -1).
int32_t decode_jpeg_batch(const char* paths, int32_t n, uint8_t* out,
                          int32_t* hs, int32_t* ws, int32_t max_h,
                          int32_t max_w, int32_t scale_denom) {
  std::vector<const char*> ptrs;
  const char* p = paths;
  for (int32_t i = 0; i < n; ++i) {
    ptrs.push_back(p);
    p += std::strlen(p) + 1;
  }
  const int64_t frame = static_cast<int64_t>(max_h) * max_w * 3;
  std::vector<std::thread> workers;
  std::vector<int32_t> ok(static_cast<size_t>(n), 0);
  for (int32_t i = 0; i < n; ++i) {
    workers.emplace_back([&, i]() {
      ok[static_cast<size_t>(i)] =
          decode_one(ptrs[static_cast<size_t>(i)], out + i * frame, hs + i,
                     ws + i, max_h, max_w, scale_denom) == 0;
      if (!ok[static_cast<size_t>(i)]) hs[i] = -1;
    });
  }
  for (auto& t : workers) t.join();
  int32_t good = 0;
  for (int32_t v : ok) good += v;
  return good;
}

}  // extern "C"

#else  // no <jpeglib.h>

extern "C" {
int32_t has_jpeg() { return 0; }
int32_t decode_jpeg_file(const char*, uint8_t*, int32_t*, int32_t*, int32_t,
                         int32_t, int32_t) { return -1; }
int32_t decode_jpeg_batch(const char*, int32_t, uint8_t*, int32_t*, int32_t*,
                          int32_t, int32_t, int32_t) { return 0; }
}

#endif
