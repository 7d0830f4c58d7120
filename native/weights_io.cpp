// Native weight-blob runtime: mmap'd zero-copy parsing and writing of the
// "DNNw" record format used for model interchange with the reference
// implementation (format spec: reference src/nnet.h:41-61 WeightHead,
// src/write_lpcnet_weights.c:47-67, src/parse_lpcnet_weights.c:36-77).
//
// Design: a blob is a sequence of 64-byte headers each followed by a
// 64-byte-aligned payload. We validate every record (bounds, name
// termination, non-negative sizes — the de-facto fuzz surface for
// untrusted weight files) and hand zero-copy pointers to Python via a
// plain C ABI (ctypes). Writing streams records with aligned padding.
//
// Build: see native/Makefile (g++ -O2 -fPIC -shared).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kBlockSize = 64;
constexpr int kVersion = 0;

#pragma pack(push, 1)
struct WeightHead {
  char head[4];
  int32_t version;
  int32_t type;    // 0=float32, 1=int32, 2=int8 ("qweight")
  int32_t size;    // payload bytes
  int32_t block_size;
  char name[44];
};
#pragma pack(pop)

static_assert(sizeof(WeightHead) == kBlockSize, "header must be 64 bytes");

struct Record {
  const char* name;
  int32_t type;
  int32_t size;
  const uint8_t* data;
};

struct Blob {
  uint8_t* base = nullptr;
  size_t len = 0;
  int fd = -1;
  Record* records = nullptr;
  int num_records = 0;
};

}  // namespace

extern "C" {

// Opens and parses a blob file. Returns an opaque handle or nullptr.
void* lpcnet_blob_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < kBlockSize) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  Blob* blob = new Blob;
  blob->base = static_cast<uint8_t*>(base);
  blob->len = st.st_size;
  blob->fd = fd;

  // First pass: count + validate.
  size_t off = 0;
  int count = 0;
  while (off + kBlockSize <= blob->len) {
    const WeightHead* h =
        reinterpret_cast<const WeightHead*>(blob->base + off);
    if (memcmp(h->head, "DNNw", 4) != 0 || h->version != kVersion ||
        h->size < 0 || h->block_size < h->size ||
        h->name[sizeof(h->name) - 1] != 0 ||
        static_cast<size_t>(h->block_size) > blob->len - off - kBlockSize) {
      munmap(base, blob->len);
      close(fd);
      delete blob;
      return nullptr;
    }
    off += kBlockSize + h->block_size;
    count++;
  }
  blob->records = new Record[count];
  blob->num_records = count;
  off = 0;
  for (int i = 0; i < count; i++) {
    const WeightHead* h =
        reinterpret_cast<const WeightHead*>(blob->base + off);
    blob->records[i] = {h->name, h->type, h->size,
                        blob->base + off + kBlockSize};
    off += kBlockSize + h->block_size;
  }
  return blob;
}

int lpcnet_blob_count(void* handle) {
  return handle ? static_cast<Blob*>(handle)->num_records : -1;
}

const char* lpcnet_blob_name(void* handle, int idx) {
  Blob* b = static_cast<Blob*>(handle);
  if (!b || idx < 0 || idx >= b->num_records) return nullptr;
  return b->records[idx].name;
}

int lpcnet_blob_type(void* handle, int idx) {
  Blob* b = static_cast<Blob*>(handle);
  if (!b || idx < 0 || idx >= b->num_records) return -1;
  return b->records[idx].type;
}

int lpcnet_blob_size(void* handle, int idx) {
  Blob* b = static_cast<Blob*>(handle);
  if (!b || idx < 0 || idx >= b->num_records) return -1;
  return b->records[idx].size;
}

const void* lpcnet_blob_data(void* handle, int idx) {
  Blob* b = static_cast<Blob*>(handle);
  if (!b || idx < 0 || idx >= b->num_records) return nullptr;
  return b->records[idx].data;
}

void lpcnet_blob_close(void* handle) {
  Blob* b = static_cast<Blob*>(handle);
  if (!b) return;
  munmap(b->base, b->len);
  close(b->fd);
  delete[] b->records;
  delete b;
}

// Streaming writer.
void* lpcnet_blob_writer_open(const char* path) {
  return fopen(path, "wb");
}

int lpcnet_blob_writer_add(void* f, const char* name, int type,
                           const void* data, int size) {
  if (!f || size < 0) return -1;
  WeightHead h;
  memset(&h, 0, sizeof(h));
  memcpy(h.head, "DNNw", 4);
  h.version = kVersion;
  h.type = type;
  h.size = size;
  h.block_size = (size + kBlockSize - 1) / kBlockSize * kBlockSize;
  strncpy(h.name, name, sizeof(h.name) - 1);
  FILE* fp = static_cast<FILE*>(f);
  if (fwrite(&h, 1, kBlockSize, fp) != static_cast<size_t>(kBlockSize))
    return -1;
  if (size && fwrite(data, 1, size, fp) != static_cast<size_t>(size))
    return -1;
  static const uint8_t zeros[kBlockSize] = {0};
  int pad = h.block_size - size;
  if (pad && fwrite(zeros, 1, pad, fp) != static_cast<size_t>(pad))
    return -1;
  return 0;
}

int lpcnet_blob_writer_close(void* f) {
  return f ? fclose(static_cast<FILE*>(f)) : -1;
}

}  // extern "C"
