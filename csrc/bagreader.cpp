// Native rosbag v2.0 reader — the data-ingestion runtime of the framework.
//
// The reference's entire data path is rosbags recorded from Carla
// (carla_tools/launch/carla_ros_bridge.launch records /imu/*, /lidar,
// /cam_forward/image_raw; evaluation replays Results_*.bag). This reader
// decodes those bags straight into flat float buffers suitable for
// zero-copy hand-off to numpy/JAX — no ROS installation needed.
//
// Format reference: http://wiki.ros.org/Bags/Format/2.0
//   file := "#ROSBAG V2.0\n" record*
//   record := header_len(u32) header(field*) data_len(u32) data
//   field  := len(u32) name '=' value
// Records: op=3 bag header, op=5 chunk (container of connection/message
// records; compression none|bz2|lz4 — all three supported: bz2/lz4 chunks
// are decompressed through libbz2/liblz4 loaded at runtime with dlopen, so
// no dev headers are required at build time), op=7 connection, op=2 message
// data, op=4 index, op=6 chunk info.
//
// Exposed as a C ABI for ctypes (vil_sensor_fusion_tpu/data/rosbag_io.py).

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

struct Connection {
  int32_t conn_id = -1;
  std::string topic;
  std::string datatype;
};

struct Message {
  int32_t conn_id;
  uint64_t time_ns;
  std::vector<uint8_t> data;
};

struct Bag {
  std::vector<Connection> connections;
  std::map<int32_t, size_t> conn_index;          // conn id -> connections idx
  std::vector<Message> messages;                 // time-ordered per file order
  std::map<std::string, std::vector<size_t>> by_topic;
  std::string error;
};

struct Cursor {
  const uint8_t* p;
  size_t n;
  bool ok = true;

  bool need(size_t k) {
    if (n < k) { ok = false; return false; }
    return true;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v;
    std::memcpy(&v, p, 4);
    p += 4; n -= 4;
    return v;
  }
  uint64_t u64() {
    if (!need(8)) return 0;
    uint64_t v;
    std::memcpy(&v, p, 8);
    p += 8; n -= 8;
    return v;
  }
  double f64() {
    if (!need(8)) return 0;
    double v;
    std::memcpy(&v, p, 8);
    p += 8; n -= 8;
    return v;
  }
  uint8_t u8() {
    if (!need(1)) return 0;
    uint8_t v = *p;
    p += 1; n -= 1;
    return v;
  }
  std::string str() {  // ROS string: u32 length + bytes
    uint32_t len = u32();
    if (!need(len)) return {};
    std::string s(reinterpret_cast<const char*>(p), len);
    p += len; n -= len;
    return s;
  }
  void skip(size_t k) {
    if (need(k)) { p += k; n -= k; }
  }
};

// Parse a record header into name->value map. Returns false on error.
bool parse_header(const uint8_t* h, size_t len,
                  std::map<std::string, std::string>* out) {
  size_t off = 0;
  while (off + 4 <= len) {
    uint32_t flen;
    std::memcpy(&flen, h + off, 4);
    off += 4;
    if (off + flen > len) return false;
    const char* f = reinterpret_cast<const char*>(h + off);
    const char* eq = static_cast<const char*>(memchr(f, '=', flen));
    if (!eq) return false;
    out->emplace(std::string(f, eq - f),
                 std::string(eq + 1, flen - (eq - f) - 1));
    off += flen;
  }
  return off == len;
}

int32_t header_i32(const std::map<std::string, std::string>& h,
                   const std::string& k, int32_t dflt = -1) {
  auto it = h.find(k);
  if (it == h.end() || it->second.size() != 4) return dflt;
  int32_t v;
  std::memcpy(&v, it->second.data(), 4);
  return v;
}

uint64_t header_u64(const std::map<std::string, std::string>& h,
                    const std::string& k) {
  auto it = h.find(k);
  if (it == h.end() || it->second.size() != 8) return 0;
  uint64_t v;
  std::memcpy(&v, it->second.data(), 8);
  return v;
}

// --- chunk decompression (bz2 / lz4, via dlopen) -----------------------------
//
// `rosbag compress` defaults to bz2; `rosbag record --lz4` emits roslz4
// streams, which use the standard LZ4 *frame* format handled by liblz4's
// LZ4F API. Symbols are resolved lazily from the runtime libraries so the
// build has no link-time dependency on either.

// int BZ2_bzBuffToBuffDecompress(char* dest, unsigned* destLen,
//                                char* source, unsigned sourceLen,
//                                int small, int verbosity);
using Bz2DecompressFn = int (*)(char*, unsigned*, char*, unsigned, int, int);

Bz2DecompressFn load_bz2() {
  static Bz2DecompressFn fn = [] {
    void* lib = dlopen("libbz2.so.1", RTLD_NOW | RTLD_GLOBAL);
    if (!lib) lib = dlopen("libbz2.so", RTLD_NOW | RTLD_GLOBAL);
    return lib ? reinterpret_cast<Bz2DecompressFn>(
                     dlsym(lib, "BZ2_bzBuffToBuffDecompress"))
               : nullptr;
  }();
  return fn;
}

struct Lz4FrameApi {
  // size_t LZ4F_createDecompressionContext(LZ4F_dctx**, unsigned version);
  size_t (*create_ctx)(void**, unsigned) = nullptr;
  size_t (*free_ctx)(void*) = nullptr;
  // size_t LZ4F_decompress(ctx, dst, size_t* dstSize, src, size_t* srcSize,
  //                        const options*);
  size_t (*decompress)(void*, void*, size_t*, const void*, size_t*,
                       const void*) = nullptr;
  unsigned (*is_error)(size_t) = nullptr;
  bool ok() const { return create_ctx && free_ctx && decompress && is_error; }
};

const Lz4FrameApi& load_lz4() {
  static Lz4FrameApi api = [] {
    Lz4FrameApi a;
    void* lib = dlopen("liblz4.so.1", RTLD_NOW | RTLD_GLOBAL);
    if (!lib) lib = dlopen("liblz4.so", RTLD_NOW | RTLD_GLOBAL);
    if (lib) {
      a.create_ctx = reinterpret_cast<size_t (*)(void**, unsigned)>(
          dlsym(lib, "LZ4F_createDecompressionContext"));
      a.free_ctx =
          reinterpret_cast<size_t (*)(void*)>(dlsym(lib, "LZ4F_freeDecompressionContext"));
      a.decompress = reinterpret_cast<size_t (*)(void*, void*, size_t*,
                                                 const void*, size_t*,
                                                 const void*)>(
          dlsym(lib, "LZ4F_decompress"));
      a.is_error =
          reinterpret_cast<unsigned (*)(size_t)>(dlsym(lib, "LZ4F_isError"));
    }
    return a;
  }();
  return api;
}

// Decompress a chunk payload. `raw_size` is the chunk header's `size` field
// (the decompressed byte count). Returns false + error message on failure.
bool decompress_chunk(const std::string& comp, const uint8_t* data,
                      size_t dlen, size_t raw_size,
                      std::vector<uint8_t>* out, std::string* error) {
  out->resize(raw_size);
  if (comp == "bz2") {
    Bz2DecompressFn fn = load_bz2();
    if (!fn) {
      *error = "bz2 chunk but libbz2 is unavailable";
      return false;
    }
    unsigned dest_len = static_cast<unsigned>(raw_size);
    int rc = fn(reinterpret_cast<char*>(out->data()), &dest_len,
                reinterpret_cast<char*>(const_cast<uint8_t*>(data)),
                static_cast<unsigned>(dlen), 0, 0);
    if (rc != 0) {
      *error = "bz2 chunk decompression failed (rc " + std::to_string(rc) + ")";
      return false;
    }
    out->resize(dest_len);
    return true;
  }
  if (comp == "lz4") {
    const Lz4FrameApi& api = load_lz4();
    if (!api.ok()) {
      *error = "lz4 chunk but liblz4's frame API is unavailable";
      return false;
    }
    void* ctx = nullptr;
    if (api.is_error(api.create_ctx(&ctx, 100))) {
      *error = "lz4 context creation failed";
      return false;
    }
    size_t dst_off = 0, src_off = 0;
    while (src_off < dlen && dst_off < raw_size) {
      size_t dst_sz = raw_size - dst_off;
      size_t src_sz = dlen - src_off;
      size_t rc = api.decompress(ctx, out->data() + dst_off, &dst_sz,
                                 data + src_off, &src_sz, nullptr);
      if (api.is_error(rc)) {
        api.free_ctx(ctx);
        *error = "lz4 chunk decompression failed";
        return false;
      }
      dst_off += dst_sz;
      src_off += src_sz;
      if (rc == 0) break;  // frame complete
      if (dst_sz == 0 && src_sz == 0) break;  // no progress
    }
    api.free_ctx(ctx);
    out->resize(dst_off);
    return true;
  }
  *error = "unsupported chunk compression: " + comp;
  return false;
}

// Parse a run of records from [p, p+n): used both for the top level and for
// chunk payloads.
bool parse_records(Bag* bag, const uint8_t* p, size_t n, int depth) {
  size_t off = 0;
  while (off + 4 <= n) {
    uint32_t hlen;
    std::memcpy(&hlen, p + off, 4);
    off += 4;
    if (off + hlen + 4 > n) return false;
    std::map<std::string, std::string> hdr;
    if (!parse_header(p + off, hlen, &hdr)) return false;
    off += hlen;
    uint32_t dlen;
    std::memcpy(&dlen, p + off, 4);
    off += 4;
    if (off + dlen > n) return false;
    const uint8_t* data = p + off;
    off += dlen;

    int32_t op = -1;
    auto it = hdr.find("op");
    if (it != hdr.end() && it->second.size() == 1) op = it->second[0];

    switch (op) {
      case 0x07: {  // connection
        Connection c;
        c.conn_id = header_i32(hdr, "conn");
        c.topic = hdr.count("topic") ? hdr["topic"] : "";
        // datatype lives in the data part's own header fields
        std::map<std::string, std::string> chdr;
        if (parse_header(data, dlen, &chdr)) {
          if (chdr.count("type")) c.datatype = chdr["type"];
          if (c.topic.empty() && chdr.count("topic")) c.topic = chdr["topic"];
        }
        if (bag->conn_index.find(c.conn_id) == bag->conn_index.end()) {
          bag->conn_index[c.conn_id] = bag->connections.size();
          bag->connections.push_back(std::move(c));
        }
        break;
      }
      case 0x02: {  // message data
        Message m;
        m.conn_id = header_i32(hdr, "conn");
        m.time_ns = header_u64(hdr, "time");
        m.data.assign(data, data + dlen);
        bag->messages.push_back(std::move(m));
        break;
      }
      case 0x05: {  // chunk
        std::string comp =
            hdr.count("compression") ? hdr["compression"] : "none";
        if (depth > 2) return false;
        if (comp == "none") {
          if (!parse_records(bag, data, dlen, depth + 1)) return false;
        } else {
          size_t raw_size = 0;
          auto sz = hdr.find("size");
          if (sz != hdr.end() && sz->second.size() == 4) {
            uint32_t v;
            std::memcpy(&v, sz->second.data(), 4);
            raw_size = v;
          }
          if (raw_size == 0) {
            bag->error = "compressed chunk missing size field";
            return false;
          }
          std::vector<uint8_t> raw;
          if (!decompress_chunk(comp, data, dlen, raw_size, &raw,
                                &bag->error))
            return false;
          if (!parse_records(bag, raw.data(), raw.size(), depth + 1))
            return false;
        }
        break;
      }
      default:
        break;  // bag header, index, chunk info: skip
    }
  }
  return true;
}

Bag* open_bag(const char* path) {
  auto bag = std::make_unique<Bag>();
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    bag->error = "cannot open file";
    return bag.release();
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    bag->error = "short read";
    return bag.release();
  }
  std::fclose(f);

  const char magic[] = "#ROSBAG V2.0\n";
  size_t mlen = sizeof(magic) - 1;
  if (size < static_cast<long>(mlen) ||
      std::memcmp(buf.data(), magic, mlen) != 0) {
    bag->error = "not a rosbag v2.0 file";
    return bag.release();
  }
  if (!parse_records(bag.get(), buf.data() + mlen, size - mlen, 0)) {
    if (bag->error.empty()) bag->error = "malformed record stream";
    return bag.release();
  }
  for (size_t i = 0; i < bag->messages.size(); ++i) {
    auto ci = bag->conn_index.find(bag->messages[i].conn_id);
    if (ci != bag->conn_index.end()) {
      bag->by_topic[bag->connections[ci->second].topic].push_back(i);
    }
  }
  return bag.release();
}

// --- message decoders -------------------------------------------------------

// std_msgs/Header: u32 seq, u32 sec, u32 nsec, string frame_id.
// Returns stamp in seconds.
double skip_header(Cursor* c) {
  c->u32();
  uint32_t sec = c->u32();
  uint32_t nsec = c->u32();
  c->str();
  return sec + 1e-9 * nsec;
}

}  // namespace

extern "C" {

void* bag_open(const char* path) { return open_bag(path); }

void bag_close(void* h) { delete static_cast<Bag*>(h); }

const char* bag_error(void* h) {
  return static_cast<Bag*>(h)->error.c_str();
}

int bag_num_connections(void* h) {
  return static_cast<int>(static_cast<Bag*>(h)->connections.size());
}

const char* bag_connection_topic(void* h, int i) {
  return static_cast<Bag*>(h)->connections[i].topic.c_str();
}

const char* bag_connection_type(void* h, int i) {
  return static_cast<Bag*>(h)->connections[i].datatype.c_str();
}

long bag_topic_count(void* h, const char* topic) {
  auto& bt = static_cast<Bag*>(h)->by_topic;
  auto it = bt.find(topic);
  return it == bt.end() ? 0 : static_cast<long>(it->second.size());
}

// sensor_msgs/Imu → t, accel[3], gyro[3] per message. Returns count.
long bag_read_imu(void* h, const char* topic, double* t, double* accel,
                  double* gyro, long max_n) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end()) return 0;
  long n = 0;
  for (size_t idx : it->second) {
    if (n >= max_n) break;
    const Message& m = bag->messages[idx];
    Cursor c{m.data.data(), m.data.size()};
    double stamp = skip_header(&c);
    // orientation quaternion (x,y,z,w) + 9 covariance
    c.skip(4 * 8 + 9 * 8);
    double wx = c.f64(), wy = c.f64(), wz = c.f64();
    c.skip(9 * 8);
    double ax = c.f64(), ay = c.f64(), az = c.f64();
    if (!c.ok) continue;
    t[n] = stamp;
    gyro[3 * n] = wx; gyro[3 * n + 1] = wy; gyro[3 * n + 2] = wz;
    accel[3 * n] = ax; accel[3 * n + 1] = ay; accel[3 * n + 2] = az;
    ++n;
  }
  return n;
}

// nav_msgs/Odometry → t, pose7 (qw qx qy qz tx ty tz), pose_cov36,
// twist_cov36. Returns count.
long bag_read_odometry(void* h, const char* topic, double* t, double* pose7,
                       double* pose_cov, double* twist_cov, long max_n) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end()) return 0;
  long n = 0;
  for (size_t idx : it->second) {
    if (n >= max_n) break;
    const Message& m = bag->messages[idx];
    Cursor c{m.data.data(), m.data.size()};
    double stamp = skip_header(&c);
    c.str();  // child_frame_id
    double px = c.f64(), py = c.f64(), pz = c.f64();
    double qx = c.f64(), qy = c.f64(), qz = c.f64(), qw = c.f64();
    for (int i = 0; i < 36; ++i) pose_cov[36 * n + i] = c.f64();
    c.skip(6 * 8);  // twist linear+angular
    for (int i = 0; i < 36; ++i) twist_cov[36 * n + i] = c.f64();
    if (!c.ok) continue;
    t[n] = stamp;
    double* p = pose7 + 7 * n;
    p[0] = qw; p[1] = qx; p[2] = qy; p[3] = qz;
    p[4] = px; p[5] = py; p[6] = pz;
    ++n;
  }
  return n;
}

// sensor_msgs/PointCloud2 (message #index on the topic) → xyz float32
// triples + stamp. Returns number of points (≤ max_points), -1 on error.
long bag_read_pointcloud(void* h, const char* topic, long index, double* t,
                         float* xyz, long max_points) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end() ||
      index >= static_cast<long>(it->second.size()))
    return -1;
  const Message& m = bag->messages[it->second[index]];
  Cursor c{m.data.data(), m.data.size()};
  *t = skip_header(&c);
  uint32_t height = c.u32();
  uint32_t width = c.u32();
  uint32_t nfields = c.u32();
  int32_t off_x = -1, off_y = -1, off_z = -1;
  uint8_t dt_x = 0;
  for (uint32_t i = 0; i < nfields && c.ok; ++i) {
    std::string name = c.str();
    uint32_t offset = c.u32();
    uint8_t datatype = c.u8();
    c.u32();  // count
    if (name == "x") { off_x = offset; dt_x = datatype; }
    if (name == "y") off_y = offset;
    if (name == "z") off_z = offset;
  }
  c.u8();  // is_bigendian
  uint32_t point_step = c.u32();
  c.u32();  // row_step
  uint32_t dlen = c.u32();
  if (!c.ok || off_x < 0 || off_y < 0 || off_z < 0 || point_step == 0)
    return -1;
  if (dt_x != 7) return -1;  // FLOAT32 only
  const uint8_t* data = c.p;
  if (c.n < dlen) return -1;
  long total = static_cast<long>(height) * width;
  long np = total < max_points ? total : max_points;
  long k = 0;
  for (long i = 0; i < np; ++i) {
    const uint8_t* rec = data + static_cast<size_t>(i) * point_step;
    if (static_cast<size_t>((i + 1)) * point_step > dlen) break;
    float x, y, z;
    std::memcpy(&x, rec + off_x, 4);
    std::memcpy(&y, rec + off_y, 4);
    std::memcpy(&z, rec + off_z, 4);
    xyz[3 * k] = x; xyz[3 * k + 1] = y; xyz[3 * k + 2] = z;
    ++k;
  }
  return k;
}

// sensor_msgs/Image (message #index) metadata: returns 0 on success and
// fills height/width/step and stamp; encoding copied into enc (cap bytes).
long bag_image_meta(void* h, const char* topic, long index, double* t,
                    long* height, long* width, long* step, char* enc,
                    long enc_cap) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end() ||
      index >= static_cast<long>(it->second.size()))
    return -1;
  const Message& m = bag->messages[it->second[index]];
  Cursor c{m.data.data(), m.data.size()};
  *t = skip_header(&c);
  *height = c.u32();
  *width = c.u32();
  std::string e = c.str();
  c.u8();
  *step = c.u32();
  if (!c.ok) return -1;
  std::snprintf(enc, enc_cap, "%s", e.c_str());
  return 0;
}

// sensor_msgs/Image pixel payload → out (must hold height*step bytes).
long bag_read_image(void* h, const char* topic, long index, uint8_t* out,
                    long cap) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end() ||
      index >= static_cast<long>(it->second.size()))
    return -1;
  const Message& m = bag->messages[it->second[index]];
  Cursor c{m.data.data(), m.data.size()};
  skip_header(&c);
  c.u32(); c.u32();  // height width
  c.str();           // encoding
  c.u8();            // bigendian
  c.u32();           // step
  uint32_t dlen = c.u32();
  if (!c.ok || c.n < dlen || dlen > static_cast<uint32_t>(cap)) return -1;
  std::memcpy(out, c.p, dlen);
  return dlen;
}

// Per-message stamps of a topic (header stamp, matching fix_rosbag_time.py's
// convention of trusting header time over record time).
long bag_topic_stamps(void* h, const char* topic, double* t, long max_n) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end()) return 0;
  long n = 0;
  for (size_t idx : it->second) {
    if (n >= max_n) break;
    const Message& m = bag->messages[idx];
    Cursor c{m.data.data(), m.data.size()};
    t[n++] = skip_header(&c);
  }
  return n;
}

// Raw record access — the passthrough for the fix-time rewriter
// (carla_tools/scripts/fix_rosbag_time.py equivalent: rewrite record
// time := header stamp without touching payloads).
long bag_record_size(void* h, const char* topic, long index) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end()) return -1;
  if (index < 0 || index >= static_cast<long>(it->second.size())) return -1;
  return static_cast<long>(bag->messages[it->second[index]].data.size());
}

// Copies the raw serialized message into `out` (up to `cap` bytes) and
// writes the bag RECORD time (seconds) to *rec_time. Returns bytes copied,
// or -1 on a bad topic/index.
long bag_read_record(void* h, const char* topic, long index,
                     double* rec_time, uint8_t* out, long cap) {
  Bag* bag = static_cast<Bag*>(h);
  auto it = bag->by_topic.find(topic);
  if (it == bag->by_topic.end()) return -1;
  if (index < 0 || index >= static_cast<long>(it->second.size())) return -1;
  const Message& m = bag->messages[it->second[index]];
  // The record header's 8-byte `time` field is a (uint32 sec, uint32 nsec)
  // pair, stored here as the raw little-endian u64 (sec in the low word).
  *rec_time = static_cast<double>(m.time_ns & 0xffffffffull)
      + static_cast<double>(m.time_ns >> 32) * 1e-9;
  long n = static_cast<long>(m.data.size());
  if (n > cap) n = cap;
  std::copy(m.data.begin(), m.data.begin() + n, out);
  return n;
}

}  // extern "C"
