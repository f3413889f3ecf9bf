// Native video I/O for stegotpu: threaded FFmpeg decode + lossless FFV1 encode.
//
// Replaces the OpenCV VideoCapture/VideoWriter dependency in the hot host
// path (the reference delegates to cv2, i.e. FFmpeg underneath:
// embed_process.py:89-100, extract_process.py:30). Exposes a minimal C ABI
// consumed via ctypes (stegotpu/native/videoio.py).
//
// Reader: demux -> multi-threaded decoder -> swscale to BGR24 batches.
// Writer: BGR24 -> FFV1 (lossless) in .avi, matching the reference container.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <thread>

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
  bool draining = false;
  bool done = false;
  std::string err;
};

struct Writer {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* enc = nullptr;
  AVStream* stream = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int width = 0, height = 0;
  int64_t pts = 0;
  std::string err;
};

thread_local std::string g_last_error;

void set_err(const std::string& e) { g_last_error = e; }

int send_to_sink(Writer* w) {
  while (true) {
    int ret = avcodec_receive_packet(w->enc, w->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
    if (ret < 0) return ret;
    av_packet_rescale_ts(w->pkt, w->enc->time_base, w->stream->time_base);
    w->pkt->stream_index = w->stream->index;
    ret = av_interleaved_write_frame(w->fmt, w->pkt);
    av_packet_unref(w->pkt);
    if (ret < 0) return ret;
  }
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
  r->dec->thread_count = static_cast<int>(std::thread::hardware_concurrency());
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

// Read up to `batch` frames as tightly packed BGR24 into out
// (batch * crop_h * crop_w * 3 bytes, top-left cropped). Returns the number
// of frames produced, 0 at EOF, -1 on error.
int svx_reader_read_batch(void* h, uint8_t* out, int batch, int crop_h,
                          int crop_w) {
  auto* r = static_cast<Reader*>(h);
  if (r->done) return 0;
  const size_t frame_bytes = static_cast<size_t>(crop_h) * crop_w * 3;
  int produced = 0;
  while (produced < batch) {
    // pull a decoded frame
    int ret = avcodec_receive_frame(r->dec, r->frame);
    if (ret == 0) {
      if (!r->sws) {
        r->sws = sws_getContext(r->width, r->height,
                                static_cast<AVPixelFormat>(r->frame->format),
                                r->width, r->height, AV_PIX_FMT_BGR24,
                                SWS_POINT, nullptr, nullptr, nullptr);
        av_image_alloc(r->bgr->data, r->bgr->linesize, r->width, r->height,
                       AV_PIX_FMT_BGR24, 32);
      }
      sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->height,
                r->bgr->data, r->bgr->linesize);
      uint8_t* dst = out + static_cast<size_t>(produced) * frame_bytes;
      for (int y = 0; y < crop_h; ++y) {
        std::memcpy(dst + static_cast<size_t>(y) * crop_w * 3,
                    r->bgr->data[0] + static_cast<size_t>(y) * r->bgr->linesize[0],
                    static_cast<size_t>(crop_w) * 3);
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
      if (avcodec_send_packet(r->dec, r->pkt) < 0) {
        set_err("send packet failed");
        av_packet_unref(r->pkt);
        return -1;
      }
    }
    av_packet_unref(r->pkt);
  }
  return produced;
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

void* svx_writer_open(const char* path, int width, int height, double fps) {
  auto* w = new Writer();
  w->width = width;
  w->height = height;
  if (avformat_alloc_output_context2(&w->fmt, nullptr, "avi", path) < 0) {
    set_err("cannot allocate avi muxer");
    delete w;
    return nullptr;
  }
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_FFV1);
  if (!codec) {
    set_err("FFV1 encoder unavailable");
    avformat_free_context(w->fmt);
    delete w;
    return nullptr;
  }
  w->stream = avformat_new_stream(w->fmt, nullptr);
  w->enc = avcodec_alloc_context3(codec);
  w->enc->width = width;
  w->enc->height = height;
  // BGR0: FFV1's lossless packed-RGB format — BGR24 samples survive exactly.
  w->enc->pix_fmt = AV_PIX_FMT_BGR0;
  AVRational tb = av_d2q(1.0 / (fps > 0 ? fps : 24.0), 1 << 24);
  w->enc->time_base = tb;
  w->stream->time_base = tb;
  w->enc->thread_count = static_cast<int>(std::thread::hardware_concurrency());
  w->enc->thread_type = FF_THREAD_SLICE;
  // FFV1 slice-parallel encoding: slices ride threads
  av_opt_set_int(w->enc->priv_data, "slicecrc", 1, 0);
  if (avcodec_open2(w->enc, codec, nullptr) < 0) {
    set_err("cannot open FFV1 encoder");
    avcodec_free_context(&w->enc);
    avformat_free_context(w->fmt);
    delete w;
    return nullptr;
  }
  avcodec_parameters_from_context(w->stream->codecpar, w->enc);
  if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&w->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      set_err(std::string("cannot open output file: ") + path);
      avcodec_free_context(&w->enc);
      avformat_free_context(w->fmt);
      delete w;
      return nullptr;
    }
  }
  if (avformat_write_header(w->fmt, nullptr) < 0) {
    set_err("cannot write avi header");
    avcodec_free_context(&w->enc);
    avformat_free_context(w->fmt);
    delete w;
    return nullptr;
  }
  w->sws = sws_getContext(width, height, AV_PIX_FMT_BGR24, width, height,
                          AV_PIX_FMT_BGR0, SWS_POINT, nullptr, nullptr, nullptr);
  w->frame = av_frame_alloc();
  w->frame->format = AV_PIX_FMT_BGR0;
  w->frame->width = width;
  w->frame->height = height;
  av_frame_get_buffer(w->frame, 32);
  w->pkt = av_packet_alloc();
  return w;
}

// Write n tightly packed BGR24 frames. Returns 0 on success.
int svx_writer_write(void* h, const uint8_t* bgr, int n) {
  auto* w = static_cast<Writer*>(h);
  const size_t frame_bytes = static_cast<size_t>(w->height) * w->width * 3;
  for (int i = 0; i < n; ++i) {
    const uint8_t* src = bgr + static_cast<size_t>(i) * frame_bytes;
    const int src_stride = w->width * 3;
    const uint8_t* src_planes[1] = {src};
    const int src_strides[1] = {src_stride};
    av_frame_make_writable(w->frame);
    sws_scale(w->sws, src_planes, src_strides, 0, w->height, w->frame->data,
              w->frame->linesize);
    w->frame->pts = w->pts++;
    if (avcodec_send_frame(w->enc, w->frame) < 0) {
      set_err("encode send failed");
      return -1;
    }
    if (send_to_sink(w) < 0) {
      set_err("mux write failed");
      return -1;
    }
  }
  return 0;
}

int svx_writer_close(void* h) {
  auto* w = static_cast<Writer*>(h);
  int rc = 0;
  avcodec_send_frame(w->enc, nullptr);  // flush encoder
  if (send_to_sink(w) < 0) rc = -1;
  if (av_write_trailer(w->fmt) < 0) rc = -1;
  if (w->sws) sws_freeContext(w->sws);
  av_frame_free(&w->frame);
  av_packet_free(&w->pkt);
  avcodec_free_context(&w->enc);
  if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&w->fmt->pb);
  avformat_free_context(w->fmt);
  delete w;
  return rc;
}

}  // extern "C"
