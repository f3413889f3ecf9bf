// Native video I/O for stegotpu: threaded FFmpeg decode + lossless FFV1 encode.
//
// Replaces the OpenCV VideoCapture/VideoWriter dependency in the hot host
// path (the reference delegates to cv2, i.e. FFmpeg underneath:
// embed_process.py:89-100, extract_process.py:30). Exposes a minimal C ABI
// consumed via ctypes (stegotpu/native/videoio.py).
//
// Reader: demux -> multi-threaded decoder -> swscale to BGR24 batches.
// Writer: BGR24 -> FFV1 (lossless) in .avi, matching the reference container.
//   FFV1 is intra-only; with gop_size=1 every frame is an independent
//   keyframe, so the writer runs a POOL of identical encoder contexts that
//   encode a batch's frames concurrently (frame-level parallelism — FFV1's
//   own slice threading tops out within one frame) and muxes the packets in
//   pts order. benchmarks/ffv1_host.py showed the encoder is the end-to-end
//   bottleneck at ~0.2-0.45 core-seconds per 1080p frame.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#ifdef __linux__
#include <sched.h>
#endif

// Usable CPU count respecting cgroup/affinity limits (hardware_concurrency
// reports the MACHINE's cores even when the process is pinned to one —
// the Python side's video.effective_cpu_count exists for the same reason;
// oversubscribing a pinned core measurably thrashes the encoder pool).
static int effective_cpus() {
#ifdef __linux__
  cpu_set_t set;
  if (sched_getaffinity(0, sizeof(set), &set) == 0) {
    int n = CPU_COUNT(&set);
    if (n > 0) return n;
  }
#endif
  int n = static_cast<int>(std::thread::hardware_concurrency());
  return n > 0 ? n : 1;
}

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* bgr = nullptr;
  AVPacket* pkt = nullptr;
  int stream_idx = -1;
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t nframes = 0;
  int sws_fmt = -1;  // pixel format the sws context was built for
  bool draining = false;
  bool done = false;
  bool pending = false;  // r->frame holds an undelivered frame (post-seek)
  std::string err;
};

// One encoder lane of the pool: its own context, converter, and scratch.
struct EncLane {
  AVCodecContext* enc = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  std::vector<AVPacket*> out;  // packets produced this batch (cloned)
  std::vector<uint8_t> scratch;  // gray->BGR replication buffer (lazy)
  bool failed = false;
};

struct Writer {
  AVFormatContext* fmt = nullptr;
  AVStream* stream = nullptr;
  std::vector<EncLane> lanes;
  int width = 0, height = 0;
  int64_t pts = 0;
  std::string err;
};

thread_local std::string g_last_error;

void set_err(const std::string& e) { g_last_error = e; }

// OpenCV's fixed-point BT.601 BGR->gray (bit-exact with cv2.cvtColor and
// stegotpu.ops.color.bgr_to_gray_np): gray = (B*3735 + G*19235 + R*9798 +
// 2^14) >> 15. Done here so the hot pipelines never materialize a host BGR
// copy just to gray-convert it in numpy (reference gray convert:
// config_and_setup.py:112).
inline void bgr_row_to_gray(const uint8_t* src, uint8_t* dst, int n) {
  for (int x = 0; x < n; ++x) {
    const uint8_t* s = src + 3 * x;
    dst[x] = static_cast<uint8_t>(
        (s[0] * 3735 + s[1] * 19235 + s[2] * 9798 + 16384) >> 15);
  }
}

// Encode one tightly packed BGR24 frame on a lane; clone emitted packets.
bool lane_encode(EncLane* l, const uint8_t* src, int width, int height,
                 int64_t pts) {
  const int src_stride = width * 3;
  const uint8_t* src_planes[1] = {src};
  const int src_strides[1] = {src_stride};
  av_frame_make_writable(l->frame);
  sws_scale(l->sws, src_planes, src_strides, 0, height, l->frame->data,
            l->frame->linesize);
  l->frame->pts = pts;
  if (avcodec_send_frame(l->enc, l->frame) < 0) return false;
  while (true) {
    int ret = avcodec_receive_packet(l->enc, l->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return true;
    if (ret < 0) return false;
    AVPacket* c = av_packet_clone(l->pkt);
    av_packet_unref(l->pkt);
    if (!c) return false;  // OOM: fail the lane, not a null deref in mux
    l->out.push_back(c);
  }
}

// Drain a flushed lane into its out vector.
bool lane_flush(EncLane* l) {
  if (avcodec_send_frame(l->enc, nullptr) < 0) return false;
  while (true) {
    int ret = avcodec_receive_packet(l->enc, l->pkt);
    if (ret == AVERROR_EOF || ret == AVERROR(EAGAIN)) return true;
    if (ret < 0) return false;
    AVPacket* c = av_packet_clone(l->pkt);
    av_packet_unref(l->pkt);
    if (!c) return false;
    l->out.push_back(c);
  }
}

// Mux every lane's collected packets in pts order (all FFV1 frames are
// independent keyframes, so pts order is the only constraint).
int mux_collected(Writer* w) {
  std::vector<AVPacket*> all;
  for (auto& l : w->lanes) {
    all.insert(all.end(), l.out.begin(), l.out.end());
    l.out.clear();
  }
  std::sort(all.begin(), all.end(),
            [](const AVPacket* a, const AVPacket* b) { return a->pts < b->pts; });
  int rc = 0;
  for (AVPacket* p : all) {
    if (rc == 0) {
      av_packet_rescale_ts(p, w->lanes[0].enc->time_base,
                           w->stream->time_base);
      p->stream_index = w->stream->index;
      if (av_interleaved_write_frame(w->fmt, p) < 0) rc = -1;
    }
    av_packet_free(&p);
  }
  return rc;
}

}  // namespace

extern "C" {

const char* svx_last_error() { return g_last_error.c_str(); }

// ---------------------------------------------------------------- reader ----

void* svx_reader_open(const char* path) {
  auto* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    set_err(std::string("cannot open input: ") + path);
    delete r;
    return nullptr;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_err("cannot read stream info");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  r->stream_idx =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (r->stream_idx < 0 || !codec) {
    set_err("no video stream");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_idx];
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = effective_cpus();
  r->dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    set_err("cannot open decoder");
    avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  r->width = r->dec->width;
  r->height = r->dec->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  r->fps = fr.den ? av_q2d(fr) : 0.0;
  r->nframes = st->nb_frames;  // container-reported; may be 0
  r->frame = av_frame_alloc();
  r->bgr = av_frame_alloc();
  r->pkt = av_packet_alloc();
  return r;
}

void svx_reader_info(void* h, int* w, int* hgt, double* fps, int64_t* nframes) {
  auto* r = static_cast<Reader*>(h);
  *w = r->width;
  *hgt = r->height;
  *fps = r->fps;
  *nframes = r->nframes;
}

// Read up to `batch` frames, top-left cropped, into either or both of:
//   bgr_out  — tightly packed BGR24 (batch * crop_h * crop_w * 3 bytes)
//   gray_out — cv2-bit-exact BT.601 gray (batch * crop_h * crop_w bytes)
// Pass nullptr for an output you don't need (extract-side pipelines read
// gray only and never pay the 3x BGR copy across the ctypes boundary).
// Returns the number of frames produced, 0 at EOF, -1 on error.
int svx_reader_read_batch(void* h, uint8_t* bgr_out, uint8_t* gray_out,
                          int batch, int crop_h, int crop_w) {
  auto* r = static_cast<Reader*>(h);
  if (r->done) return 0;
  if (!bgr_out && !gray_out) {
    set_err("read_batch: no output buffer");
    return -1;
  }
  const size_t bgr_bytes = static_cast<size_t>(crop_h) * crop_w * 3;
  const size_t gray_bytes = static_cast<size_t>(crop_h) * crop_w;
  int produced = 0;
  while (produced < batch) {
    // pull a decoded frame (or the one a seek left in hand)
    int ret;
    if (r->pending) {
      r->pending = false;
      ret = 0;
    } else {
      ret = avcodec_receive_frame(r->dec, r->frame);
    }
    if (ret == 0) {
      // revalidate per frame: a mid-stream dimension or pixel-format
      // change (parameter-set switch in a spliced/crafted file) would
      // make sws_scale read rows the frame buffer doesn't have — surface
      // a structured error instead of an out-of-bounds read
      if (r->frame->width != r->width || r->frame->height != r->height ||
          (r->sws && r->frame->format != r->sws_fmt)) {
        set_err("mid-stream dimension/pixel-format change");
        av_frame_unref(r->frame);
        return -1;
      }
      if (!r->sws) {
        r->sws_fmt = r->frame->format;
        r->sws = sws_getContext(r->width, r->height,
                                static_cast<AVPixelFormat>(r->frame->format),
                                r->width, r->height, AV_PIX_FMT_BGR24,
                                SWS_POINT, nullptr, nullptr, nullptr);
        av_image_alloc(r->bgr->data, r->bgr->linesize, r->width, r->height,
                       AV_PIX_FMT_BGR24, 32);
      }
      sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->height,
                r->bgr->data, r->bgr->linesize);
      for (int y = 0; y < crop_h; ++y) {
        const uint8_t* row =
            r->bgr->data[0] + static_cast<size_t>(y) * r->bgr->linesize[0];
        if (bgr_out) {
          std::memcpy(bgr_out + static_cast<size_t>(produced) * bgr_bytes +
                          static_cast<size_t>(y) * crop_w * 3,
                      row, static_cast<size_t>(crop_w) * 3);
        }
        if (gray_out) {
          bgr_row_to_gray(row,
                          gray_out + static_cast<size_t>(produced) * gray_bytes +
                              static_cast<size_t>(y) * crop_w,
                          crop_w);
        }
      }
      av_frame_unref(r->frame);
      ++produced;
      continue;
    }
    if (ret == AVERROR_EOF) {
      r->done = true;
      break;
    }
    if (ret != AVERROR(EAGAIN)) {
      set_err("decode error");
      return -1;
    }
    // need more input
    if (r->draining) continue;
    ret = av_read_frame(r->fmt, r->pkt);
    if (ret < 0) {
      r->draining = true;
      avcodec_send_packet(r->dec, nullptr);  // flush
      continue;
    }
    if (r->pkt->stream_index == r->stream_idx) {
      // a corrupt packet (bad data) is not fatal, but it must END the
      // stream, not be skipped: skipping would splice frame N+1 into
      // index N and silently desync every later bit offset. Draining
      // here delivers the intact PREFIX as a short read — the structured
      // failure mode the fuzz contract pins (tests/test_native_fuzz.py).
      // Anything OTHER than bad data (ENOMEM, decoder-state errors) must
      // surface, not be laundered into a clean-looking short read.
      ret = avcodec_send_packet(r->dec, r->pkt);
      if (ret == AVERROR_INVALIDDATA) {
        av_packet_unref(r->pkt);
        r->draining = true;
        avcodec_send_packet(r->dec, nullptr);  // flush the intact prefix
        continue;
      }
      if (ret < 0 && ret != AVERROR(EAGAIN)) {
        char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
        av_strerror(ret, buf, sizeof(buf));
        set_err(std::string("decoder rejected packet: ") + buf);
        av_packet_unref(r->pkt);
        return -1;
      }
    }
    av_packet_unref(r->pkt);
  }
  return produced;
}

// Position the stream so the NEXT delivered frame is `frame_index`
// (0-based). Exact: seeks the demuxer to the nearest prior keyframe, then
// decodes forward discarding frames below the target — for the intra-only
// codecs this library writes (FFV1/HuffYUV/rawvideo) the keyframe IS the
// target and nothing is discarded; inter-coded covers (mp4) pay only the
// keyframe->target stretch instead of a decode from frame 0.
// Returns 0 on success (seeking past EOF parks the reader at EOF),
// -1 on error (unseekable container, no frame rate, decoder failure).
int svx_reader_seek(void* h, int64_t frame_index) {
  auto* r = static_cast<Reader*>(h);
  AVStream* st = r->fmt->streams[r->stream_idx];
  AVRational fr =
      st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  if (!fr.num || !fr.den) {
    set_err("seek: unknown frame rate");
    return -1;
  }
  const int64_t start =
      st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  const int64_t ts =
      start + av_rescale_q(frame_index, av_inv_q(fr), st->time_base);
  if (av_seek_frame(r->fmt, r->stream_idx, ts, AVSEEK_FLAG_BACKWARD) < 0) {
    set_err("seek failed (unseekable container?)");
    return -1;
  }
  avcodec_flush_buffers(r->dec);
  if (r->pending) av_frame_unref(r->frame);
  r->draining = false;
  r->done = false;
  r->pending = false;
  while (true) {
    int ret = avcodec_receive_frame(r->dec, r->frame);
    if (ret == 0) {
      int64_t pts = r->frame->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE) pts = r->frame->pts;
      const int64_t idx =
          (pts == AV_NOPTS_VALUE)
              ? frame_index  // no timestamps at all: trust the demuxer seek
              : av_rescale_q(pts - start, st->time_base, av_inv_q(fr));
      if (idx >= frame_index) {
        r->pending = true;  // delivered by the next read_batch
        return 0;
      }
      av_frame_unref(r->frame);
      continue;
    }
    if (ret == AVERROR_EOF) {
      r->done = true;  // sought past the end: reads return 0 (EOF)
      return 0;
    }
    if (ret != AVERROR(EAGAIN)) {
      set_err("decode error during seek");
      return -1;
    }
    if (r->draining) continue;
    ret = av_read_frame(r->fmt, r->pkt);
    if (ret < 0) {
      r->draining = true;
      avcodec_send_packet(r->dec, nullptr);
      continue;
    }
    if (r->pkt->stream_index == r->stream_idx) {
      ret = avcodec_send_packet(r->dec, r->pkt);
      if (ret < 0 && ret != AVERROR_INVALIDDATA && ret != AVERROR(EAGAIN)) {
        av_packet_unref(r->pkt);
        set_err("decoder rejected packet during seek");
        return -1;
      }
    }
    av_packet_unref(r->pkt);
  }
}

void svx_reader_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (r->sws) sws_freeContext(r->sws);
  if (r->bgr && r->bgr->data[0]) av_freep(&r->bgr->data[0]);
  av_frame_free(&r->bgr);
  av_frame_free(&r->frame);
  av_packet_free(&r->pkt);
  avcodec_free_context(&r->dec);
  avformat_close_input(&r->fmt);
  delete r;
}

// ---------------------------------------------------------------- writer ----

namespace {

void free_lane(EncLane& l) {
  for (AVPacket* p : l.out) av_packet_free(&p);
  l.out.clear();
  if (l.sws) sws_freeContext(l.sws);
  if (l.frame) av_frame_free(&l.frame);
  if (l.pkt) av_packet_free(&l.pkt);
  if (l.enc) avcodec_free_context(&l.enc);
}

void destroy_writer(Writer* w) {
  for (auto& l : w->lanes) free_lane(l);
  if (w->fmt) {
    if (w->fmt->pb && !(w->fmt->oformat->flags & AVFMT_NOFILE))
      avio_closep(&w->fmt->pb);
    avformat_free_context(w->fmt);
  }
  delete w;
}

bool open_lane(EncLane& l, const AVCodec* codec, AVPixelFormat pix,
               int width, int height, AVRational tb, int threads_per_lane) {
  l.enc = avcodec_alloc_context3(codec);
  l.enc->width = width;
  l.enc->height = height;
  // packed-RGB lossless format for the codec — BGR24 samples survive exactly
  l.enc->pix_fmt = pix;
  l.enc->time_base = tb;
  // every frame an independent keyframe: required for the parallel pool,
  // and the archival norm for lossless codecs
  l.enc->gop_size = 1;
  l.enc->thread_count = threads_per_lane;
  l.enc->thread_type = FF_THREAD_SLICE;
  if (codec->id == AV_CODEC_ID_FFV1)
    av_opt_set_int(l.enc->priv_data, "slicecrc", 1, 0);
  if (avcodec_open2(l.enc, codec, nullptr) < 0) return false;
  l.sws = sws_getContext(width, height, AV_PIX_FMT_BGR24, width, height,
                         pix, SWS_POINT, nullptr, nullptr, nullptr);
  l.frame = av_frame_alloc();
  l.frame->format = pix;
  l.frame->width = width;
  l.frame->height = height;
  av_frame_get_buffer(l.frame, 32);
  l.pkt = av_packet_alloc();
  return true;
}

}  // namespace

// Open a writer with `workers` parallel lossless encoder lanes (0 = auto:
// hardware threads, capped at 8; batches smaller than the pool use fewer).
// codec_name: "ffv1" (default container parity) or "huffyuv" (~5x less
// encode work per core, measured pixel-exact).
void* svx_writer_open(const char* path, int width, int height, double fps,
                      int workers, const char* codec_name) {
  auto* w = new Writer();
  w->width = width;
  w->height = height;
  if (avformat_alloc_output_context2(&w->fmt, nullptr, "avi", path) < 0) {
    set_err("cannot allocate avi muxer");
    delete w;
    return nullptr;
  }
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    set_err(std::string("encoder unavailable: ") + codec_name);
    destroy_writer(w);
    return nullptr;
  }
  // lossless packed-RGB pixel format per codec (BGR24 survives exactly);
  // rawvideo stores BGR24 directly (no entropy coding — the memcpy codec)
  AVPixelFormat pix = codec->id == AV_CODEC_ID_FFV1      ? AV_PIX_FMT_BGR0
                      : codec->id == AV_CODEC_ID_RAWVIDEO ? AV_PIX_FMT_BGR24
                                                          : AV_PIX_FMT_RGB24;
  int hw = effective_cpus();
  if (hw < 1) hw = 1;
  int n = workers > 0 ? workers : std::min(hw, 8);
  // split the cores between frame-level (lanes) and slice-level (threads
  // per lane) parallelism so small write() batches — e.g. a run of 1-2
  // payload frames — still use the machine
  int per_lane = std::max(1, hw / n);

  w->stream = avformat_new_stream(w->fmt, nullptr);
  AVRational tb = av_d2q(1.0 / (fps > 0 ? fps : 24.0), 1 << 24);
  w->stream->time_base = tb;
  w->lanes.resize(static_cast<size_t>(n));
  for (auto& l : w->lanes) {
    if (!open_lane(l, codec, pix, width, height, tb, per_lane)) {
      set_err(std::string("cannot open encoder: ") + codec_name);
      destroy_writer(w);
      return nullptr;
    }
  }
  avcodec_parameters_from_context(w->stream->codecpar, w->lanes[0].enc);
  if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&w->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      set_err(std::string("cannot open output file: ") + path);
      destroy_writer(w);
      return nullptr;
    }
  }
  if (avformat_write_header(w->fmt, nullptr) < 0) {
    set_err("cannot write avi header");
    destroy_writer(w);
    return nullptr;
  }
  return w;
}

namespace {

// Shared fan-out for the BGR and gray write entry points: stripe `n` frames
// across the encoder lanes, encode concurrently, mux in pts order. `gray`
// selects the per-frame source interpretation (BGR24 vs single-channel gray
// replicated to BGR in the lane's scratch buffer — the stego pipeline's
// GRAY2BGR step, reference: embed_process.py:126 — so the host never builds
// the 3x replicated array).
int writer_write_impl(Writer* w, const uint8_t* src, int n, bool gray) {
  const size_t frame_bytes =
      static_cast<size_t>(w->height) * w->width * (gray ? 1 : 3);
  const int nlanes = static_cast<int>(w->lanes.size());
  const int64_t base_pts = w->pts;

  auto run_lane = [&](int li) {
    EncLane* l = &w->lanes[static_cast<size_t>(li)];
    for (int i = li; i < n; i += nlanes) {
      const uint8_t* frame_src = src + static_cast<size_t>(i) * frame_bytes;
      if (gray) {
        if (l->scratch.empty())
          l->scratch.resize(static_cast<size_t>(w->height) * w->width * 3);
        uint8_t* d = l->scratch.data();
        const size_t npx = static_cast<size_t>(w->height) * w->width;
        for (size_t p = 0; p < npx; ++p) {
          const uint8_t v = frame_src[p];
          d[3 * p] = v;
          d[3 * p + 1] = v;
          d[3 * p + 2] = v;
        }
        frame_src = d;
      }
      if (!lane_encode(l, frame_src, w->width, w->height, base_pts + i)) {
        l->failed = true;
        return;
      }
    }
  };

  if (nlanes == 1 || n == 1) {
    run_lane(0);
  } else {
    std::vector<std::thread> threads;
    const int active = std::min(nlanes, n);
    threads.reserve(static_cast<size_t>(active));
    for (int li = 0; li < active; ++li) threads.emplace_back(run_lane, li);
    for (auto& t : threads) t.join();
  }
  w->pts += n;
  for (auto& l : w->lanes) {
    if (l.failed) {
      set_err("encode send failed");
      return -1;
    }
  }
  if (mux_collected(w) < 0) {
    set_err("mux write failed");
    return -1;
  }
  return 0;
}

}  // namespace

// Write n tightly packed BGR24 frames. Returns 0 on success.
int svx_writer_write(void* h, const uint8_t* bgr, int n) {
  return writer_write_impl(static_cast<Writer*>(h), bgr, n, false);
}

// Write n tightly packed single-channel gray frames, replicated to BGR
// (GRAY2BGR) inside the encoder lanes. Returns 0 on success.
int svx_writer_write_gray(void* h, const uint8_t* gray, int n) {
  return writer_write_impl(static_cast<Writer*>(h), gray, n, true);
}

// Concatenate same-codec video segments into one container by PACKET
// stream-copy — no decode, no re-encode (the multi-host embed path: each
// host writes its frame-range segment, then one remux stitches them;
// docs/ARCHITECTURE.md "Multi-host"). All inputs must share codec and
// dimensions (true for segments produced by svx_writer_open with the same
// parameters). Returns 0 on success.
int svx_concat(const char* out_path, const char** inputs, int n_inputs) {
  if (n_inputs < 1) {
    set_err("concat needs at least one input");
    return -1;
  }
  AVFormatContext* out = nullptr;
  if (avformat_alloc_output_context2(&out, nullptr, "avi", out_path) < 0) {
    set_err("cannot allocate avi muxer");
    return -1;
  }
  AVStream* ostream = nullptr;
  bool header_written = false;
  int64_t pts_off = 0;
  int rc = 0;
  AVPacket* pkt = av_packet_alloc();

  for (int i = 0; i < n_inputs && rc == 0; ++i) {
    AVFormatContext* in = nullptr;
    if (avformat_open_input(&in, inputs[i], nullptr, nullptr) < 0 ||
        avformat_find_stream_info(in, nullptr) < 0) {
      set_err(std::string("cannot open segment: ") + inputs[i]);
      if (in) avformat_close_input(&in);
      rc = -1;
      break;
    }
    int vidx = av_find_best_stream(in, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (vidx < 0) {
      set_err(std::string("no video stream in segment: ") + inputs[i]);
      avformat_close_input(&in);
      rc = -1;
      break;
    }
    AVStream* istream = in->streams[vidx];
    if (!ostream) {
      ostream = avformat_new_stream(out, nullptr);
      avcodec_parameters_copy(ostream->codecpar, istream->codecpar);
      ostream->time_base = istream->time_base;
      if (!(out->oformat->flags & AVFMT_NOFILE) &&
          avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0) {
        set_err(std::string("cannot open output: ") + out_path);
        avformat_close_input(&in);
        rc = -1;
        break;
      }
      if (avformat_write_header(out, nullptr) < 0) {
        set_err("cannot write avi header");
        avformat_close_input(&in);
        rc = -1;
        break;
      }
      header_written = true;
    } else if (istream->codecpar->codec_id != ostream->codecpar->codec_id ||
               istream->codecpar->width != ostream->codecpar->width ||
               istream->codecpar->height != ostream->codecpar->height ||
               istream->codecpar->format != ostream->codecpar->format ||
               av_cmp_q(istream->time_base, ostream->time_base) != 0) {
      // format (pix_fmt) and time_base must match too: same-codec
      // segments with different pixel formats decode to garbage after
      // the first segment under its codecpar, and mixed tick rates would
      // silently retime segment 2+ — refuse rather than emit a broken file
      set_err(std::string("segment codec/dims/pixfmt/timebase mismatch: ") +
              inputs[i]);
      avformat_close_input(&in);
      rc = -1;
      break;
    }
    int64_t seg_frames = 0;
    while (av_read_frame(in, pkt) >= 0) {
      if (pkt->stream_index != vidx) {
        av_packet_unref(pkt);
        continue;
      }
      // our segments are fixed-fps intra-only streams: renumber frames
      // with a running offset (packet order IS frame order at gop 1)
      pkt->pts = pkt->dts = pts_off + seg_frames;
      pkt->duration = 1;
      pkt->stream_index = 0;
      pkt->pos = -1;
      ++seg_frames;
      if (av_interleaved_write_frame(out, pkt) < 0) {
        set_err("concat mux write failed");
        rc = -1;
        break;
      }
    }
    pts_off += seg_frames;
    avformat_close_input(&in);
  }
  av_packet_free(&pkt);
  // av_write_trailer is only legal after a successful avformat_write_header
  if (header_written && rc == 0 && av_write_trailer(out) < 0) {
    set_err("cannot write avi trailer");
    rc = -1;
  } else if (header_written && rc != 0) {
    av_write_trailer(out);
  }
  if (!(out->oformat->flags & AVFMT_NOFILE) && out->pb) avio_closep(&out->pb);
  avformat_free_context(out);
  return rc;
}

int svx_writer_close(void* h) {
  auto* w = static_cast<Writer*>(h);
  int rc = 0;
  bool any_failed = false;
  for (auto& l : w->lanes) any_failed |= l.failed;
  if (any_failed) {
    // a lane died mid-batch: the surviving lanes' queued packets are a
    // PARTIAL batch (writer_write_impl returned -1 before muxing them).
    // Muxing them here would emit a file with a silent pts gap that
    // extracts to corrupt payload while close() reports success — drop
    // the partial batch, finalize the prefix, and report failure so the
    // caller knows the file is short. (lane.failed is deliberately
    // sticky: the encoder context's state is unknown after a failed
    // send, so the writer is fail-closed from that point.)
    for (auto& l : w->lanes) {
      for (AVPacket* p : l.out) av_packet_free(&p);
      l.out.clear();
    }
    set_err("close after failed write: output truncated at the last "
            "complete batch");
    rc = -1;
  } else {
    for (auto& l : w->lanes) {
      if (!lane_flush(&l)) rc = -1;
    }
    if (mux_collected(w) < 0) rc = -1;
  }
  if (av_write_trailer(w->fmt) < 0) rc = -1;
  for (auto& l : w->lanes) free_lane(l);
  w->lanes.clear();
  if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&w->fmt->pb);
  avformat_free_context(w->fmt);
  delete w;
  return rc;
}

}  // extern "C"
