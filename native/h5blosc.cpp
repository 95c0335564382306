// HDF5 dynamic filter plugin for Blosc (HDF5 filter id 32001).
//
// Clean-room implementation against two public, stable C ABIs:
//   * the HDF5 filter-plugin interface (H5PLget_plugin_type /
//     H5PLget_plugin_info + H5Z_class2_t), declared locally below so the
//     plugin needs no HDF5 headers and never calls back into libhdf5 —
//     which also makes it version-agnostic across the HDF5 1.10/1.14 ABIs;
//   * the c-blosc 1.x API (system libblosc.so.1), using only the
//     re-entrant *_ctx entry points (no blosc_init / global state).
//
// Purpose: read and write the blosc-zstd compressed event_representations.h5
// files of the published RVT datasets. The reference writes them via
// hdf5plugin with cd_values (0, 0, 0, 0, complevel, shuffle, complib)
// (/root/reference/utils/preprocessing.py:1-13) and reads them through
// h5py+hdf5plugin (/root/reference/data/genx_utils/sequence_base.py:92-102).
// Neither hdf5plugin nor python-blosc is in this image, hence this filter.
//
// cd_values convention (public Blosc HDF5 filter layout):
//   [0] filter revision  [1] blosc version      [2] typesize (bytes)
//   [3] chunk size bytes [4] compression level  [5] shuffle (0/1/2)
//   [6] compressor code  (0 blosclz, 1 lz4, 2 lz4hc, 3 snappy, 4 zlib, 5 zstd)
// Decompression ignores cd_values entirely: every blosc chunk is
// self-describing (16-byte header carries typesize/shuffle/codec/sizes).

#include <cstdlib>
#include <cstring>
#include <cstddef>

// ---- c-blosc 1.x public API (system libblosc.so.1; no header shipped) ----
extern "C" {
int blosc_compress_ctx(int clevel, int doshuffle, size_t typesize,
                       size_t nbytes, const void* src, void* dest,
                       size_t destsize, const char* compressor,
                       size_t blocksize, int numinternalthreads);
int blosc_decompress_ctx(const void* src, void* dest, size_t destsize,
                         int numinternalthreads);
void blosc_cbuffer_sizes(const void* cbuffer, size_t* nbytes, size_t* cbytes,
                         size_t* blocksize);
int blosc_cbuffer_validate(const void* cbuffer, size_t cbytes,
                           size_t* nbytes);
}

static const size_t kBloscMaxOverhead = 16;  // BLOSC_MAX_OVERHEAD

// ---- HDF5 plugin ABI (public, stable; declared locally on purpose) -------
extern "C" {
typedef int H5Z_filter_t;
typedef long long hid_t;
typedef int herr_t;
typedef int htri_t;
typedef htri_t (*H5Z_can_apply_func_t)(hid_t, hid_t, hid_t);
typedef herr_t (*H5Z_set_local_func_t)(hid_t, hid_t, hid_t);
typedef size_t (*H5Z_func_t)(unsigned flags, size_t cd_nelmts,
                             const unsigned cd_values[], size_t nbytes,
                             size_t* buf_size, void** buf);

typedef struct H5Z_class2_t {
  int version;  // H5Z_CLASS_T_VERS == 1
  H5Z_filter_t id;
  unsigned encoder_present;
  unsigned decoder_present;
  const char* name;
  H5Z_can_apply_func_t can_apply;
  H5Z_set_local_func_t set_local;
  H5Z_func_t filter;
} H5Z_class2_t;

typedef enum { H5PL_TYPE_ERROR = -1, H5PL_TYPE_FILTER = 0 } H5PL_type_t;
}

static const unsigned kH5ZFlagReverse = 0x0100;  // H5Z_FLAG_REVERSE
static const H5Z_filter_t kBloscFilterId = 32001;

static const char* kCompressorNames[] = {"blosclz", "lz4",  "lz4hc",
                                         "snappy",  "zlib", "zstd"};

extern "C" size_t blosc_h5_filter(unsigned flags, size_t cd_nelmts,
                                  const unsigned cd_values[], size_t nbytes,
                                  size_t* buf_size, void** buf) {
  if (flags & kH5ZFlagReverse) {
    // -------- decompress: chunk is self-describing --------
    if (nbytes < kBloscMaxOverhead) return 0;
    size_t out_nbytes = 0;
    if (blosc_cbuffer_validate(*buf, nbytes, &out_nbytes) < 0) return 0;
    void* out = std::malloc(out_nbytes ? out_nbytes : 1);
    if (out == nullptr) return 0;
    int status = blosc_decompress_ctx(*buf, out, out_nbytes, 1);
    if (status <= 0 && out_nbytes != 0) {
      std::free(out);
      return 0;
    }
    std::free(*buf);
    *buf = out;
    *buf_size = out_nbytes;
    return out_nbytes;
  }

  // -------- compress --------
  int clevel = (cd_nelmts > 4) ? static_cast<int>(cd_values[4]) : 5;
  int shuffle = (cd_nelmts > 5) ? static_cast<int>(cd_values[5]) : 1;
  unsigned compcode = (cd_nelmts > 6) ? cd_values[6] : 0;
  if (compcode > 5) return 0;
  size_t typesize = (cd_nelmts > 2 && cd_values[2] > 0) ? cd_values[2] : 1;
  // Blosc shuffles on typesize boundaries; a typesize that does not divide
  // the buffer is invalid — fall back to bytes (matches filter_blosc.c).
  if (typesize == 0 || nbytes % typesize != 0) typesize = 1;

  size_t destsize = nbytes + kBloscMaxOverhead;
  void* out = std::malloc(destsize);
  if (out == nullptr) return 0;
  int csize =
      blosc_compress_ctx(clevel, shuffle, typesize, nbytes, *buf, out,
                         destsize, kCompressorNames[compcode], /*blocksize=*/0,
                         /*numinternalthreads=*/1);
  if (csize <= 0) {
    std::free(out);
    return 0;
  }
  std::free(*buf);
  *buf = out;
  *buf_size = destsize;
  return static_cast<size_t>(csize);
}

static const H5Z_class2_t kBloscFilterClass = {
    /*version=*/1,
    /*id=*/kBloscFilterId,
    /*encoder_present=*/1,
    /*decoder_present=*/1,
    /*name=*/"blosc (rvt_tpu first-party plugin backed by libblosc)",
    /*can_apply=*/nullptr,
    /*set_local=*/nullptr,
    /*filter=*/blosc_h5_filter,
};

extern "C" H5PL_type_t H5PLget_plugin_type(void) { return H5PL_TYPE_FILTER; }
extern "C" const void* H5PLget_plugin_info(void) {
  return static_cast<const void*>(&kBloscFilterClass);
}
