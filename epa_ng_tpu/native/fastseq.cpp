// fastseq: native FASTA scanning/encoding for the streaming query path.
//
// The TPU-native analog of the reference's genesis FastaInputIterator +
// 4-bit encoder (reference: src/seq/MSA_Stream.cpp, src/io/encoding.hpp):
// the host-side bottleneck at 100k+ query scale is turning FASTA text into
// padded code matrices; this does one mmap pass with table-driven encoding
// straight into the caller's numpy buffers. Loaded via ctypes
// (epa_ng_tpu/io/native.py) with a pure-python fallback.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Reader {
  int fd = -1;
  const char* data = nullptr;
  size_t size = 0;
  size_t pos = 0;
};

// advance past one fasta record starting at p ('>' expected); returns
// pointers/lengths for label and the sequence spans (line by line)
inline const char* find_nl(const char* p, const char* end) {
  const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
  return nl ? nl : end;
}

}  // namespace

extern "C" {

void* fs_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* r = new Reader();
  r->fd = fd;
  r->data = static_cast<const char*>(mem);
  r->size = static_cast<size_t>(st.st_size);
  r->pos = 0;
  return r;
}

void fs_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r) return;
  if (r->data) munmap(const_cast<char*>(r->data), r->size);
  if (r->fd >= 0) close(r->fd);
  delete r;
}

// One info prepass: counts sequences, checks equal widths, AND-accumulates
// the all-gap column mask. Gap chars follow genesis'
// nucleic_acid_codes_undetermined() set "NOX.-?", matched case-
// insensitively (the rule the reference's MSA_Info prepass applies,
// src/seq/MSA_Info.hpp:53).
// Returns 0 on success; -1 io error; -2 width mismatch; -3 not fasta.
// gap_mask (caller-allocated, >= n_sites bytes) may be null.
long fs_info(const char* path, int64_t* n_seqs, int64_t* n_sites,
             uint8_t* gap_mask, int64_t mask_cap) {
  auto* r = static_cast<Reader*>(fs_open(path));
  if (!r) return -1;
  const char* p = r->data;
  const char* end = r->data + r->size;
  int64_t count = 0;
  int64_t sites = 0;
  bool mask_init = false;

  while (p < end && (*p == '\n' || *p == '\r')) p++;
  if (p < end && *p != '>') {
    fs_close(r);
    return -3;
  }
  while (p < end) {
    if (*p != '>') break;
    p = find_nl(p, end);  // skip label line
    if (p < end) p++;
    int64_t slen = 0;
    while (p < end && *p != '>') {
      const char* nl = find_nl(p, end);
      for (const char* q = p; q < nl; ++q) {
        char c = *q;
        if (c == '\r' || c == ' ' || c == '\t') continue;
        bool gap = (c == '-' || c == '?' || c == '.' ||
                    c == 'N' || c == 'n' || c == 'O' || c == 'o' ||
                    c == 'X' || c == 'x');
        if (gap_mask && slen < mask_cap) {
          if (!mask_init) {
            gap_mask[slen] = gap ? 1 : 0;
          } else if (!gap) {
            gap_mask[slen] = 0;
          }
        }
        slen++;
      }
      p = nl < end ? nl + 1 : end;
    }
    mask_init = true;
    if (sites == 0) {
      sites = slen;
    } else if (slen != sites) {
      fs_close(r);
      return -2;
    }
    count++;
  }
  *n_seqs = count;
  *n_sites = sites;
  fs_close(r);
  return 0;
}

// Skip n records from the current position.
long fs_skip(void* handle, int64_t n) {
  auto* r = static_cast<Reader*>(handle);
  const char* p = r->data + r->pos;
  const char* end = r->data + r->size;
  while (p < end && (*p == '\n' || *p == '\r')) p++;
  int64_t skipped = 0;
  while (p < end && skipped < n) {
    if (*p != '>') break;
    p = find_nl(p, end);
    if (p < end) p++;
    while (p < end && *p != '>') {
      p = find_nl(p, end);
      if (p < end) p++;
    }
    skipped++;
  }
  r->pos = p - r->data;
  return skipped;
}

// Read up to max_seqs records, encoding with code_map (256 entries; 0xFF =
// invalid char -> abort with -4). If mask != null, columns with mask[i] != 0
// are dropped (premasking); codes_out row width must be out_sites.
// Labels are written NUL-terminated back-to-back into labels_out.
// Returns number of sequences read, or a negative error.
long fs_read_chunk(void* handle, int64_t max_seqs, int64_t in_sites,
                   int64_t out_sites, const uint8_t* code_map,
                   const uint8_t* mask, uint8_t* codes_out,
                   char* labels_out, int64_t labels_cap) {
  auto* r = static_cast<Reader*>(handle);
  const char* p = r->data + r->pos;
  const char* end = r->data + r->size;
  int64_t nread = 0;
  int64_t label_off = 0;

  while (p < end && (*p == '\n' || *p == '\r')) p++;
  while (p < end && nread < max_seqs) {
    if (*p != '>') break;
    const char* lstart = p + 1;
    const char* nl = find_nl(p, end);
    const char* lend = nl;
    while (lend > lstart && (lend[-1] == '\r')) lend--;
    int64_t llen = lend - lstart;
    if (label_off + llen + 1 > labels_cap) return -5;
    memcpy(labels_out + label_off, lstart, llen);
    labels_out[label_off + llen] = '\0';
    label_off += llen + 1;

    p = nl < end ? nl + 1 : end;
    uint8_t* row = codes_out + nread * out_sites;
    int64_t in_col = 0;
    int64_t out_col = 0;
    while (p < end && *p != '>') {
      nl = find_nl(p, end);
      for (const char* q = p; q < nl; ++q) {
        char c = *q;
        if (c == '\r' || c == ' ' || c == '\t') continue;
        if (in_col >= in_sites) return -2;
        bool keep = !mask || !mask[in_col];
        in_col++;
        if (!keep) continue;
        uint8_t code = code_map[static_cast<uint8_t>(c)];
        if (code == 0xFF) return -4;
        if (out_col >= out_sites) return -2;
        row[out_col++] = code;
      }
      p = nl < end ? nl + 1 : end;
    }
    if (out_col != out_sites || in_col != in_sites) return -2;
    nread++;
  }
  r->pos = p - r->data;
  return nread;
}

}  // extern "C"
