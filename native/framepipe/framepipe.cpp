// framepipe: threaded FFmpeg video decode engine feeding the TPU pipeline.
//
// Native-runtime role: the reference delegates host video decode to decord
// (C++/FFmpeg) at src/dataset.py:154-159 / extract_features.py:123-140; this
// is the equivalent component for the TPU rebuild — a C library that decodes
// a video into fixed-size RGB24 frame chunks on a background thread with a
// bounded ring of chunk buffers, so host decode overlaps device compute
// (double buffering). Exposed through a minimal C ABI consumed via ctypes
// (anomaly_detection_on_video_tpu/data/framepipe.py).
//
// Build: make -C native/framepipe   (links libavformat/avcodec/avutil/swscale)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Chunk {
  std::vector<uint8_t> data;
  int n_frames = 0;
};

struct Stream {
  // config
  std::string path;
  int chunk_frames = 0;
  int depth = 2;

  // video geometry (filled by open_video)
  int width = 0;
  int height = 0;
  int64_t approx_frames = 0;
  double fps = 0.0;

  // ring of decoded chunks
  std::mutex mu;
  std::condition_variable cv_produced;
  std::condition_variable cv_consumed;
  std::deque<Chunk> ready;
  std::vector<Chunk> free_list;
  bool done = false;
  std::string error;

  std::thread worker;
  std::atomic<bool> stop{false};
};

bool open_video(const std::string& path, AVFormatContext** fmt_out,
                AVCodecContext** dec_out, int* stream_index,
                std::string* error) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path.c_str(), nullptr, nullptr) < 0) {
    *error = "cannot open " + path;
    return false;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    *error = "no stream info in " + path;
    return false;
  }
  const AVCodec* codec = nullptr;
  int idx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (idx < 0 || codec == nullptr) {
    avformat_close_input(&fmt);
    *error = "no video stream in " + path;
    return false;
  }
  AVCodecContext* dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(dec, fmt->streams[idx]->codecpar);
  dec->thread_count = 0;  // auto: frame/slice threading inside FFmpeg
  if (avcodec_open2(dec, codec, nullptr) < 0) {
    avcodec_free_context(&dec);
    avformat_close_input(&fmt);
    *error = "cannot open codec for " + path;
    return false;
  }
  *fmt_out = fmt;
  *dec_out = dec;
  *stream_index = idx;
  return true;
}

void decode_loop(Stream* s) {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;
  std::string error;
  if (!open_video(s->path, &fmt, &dec, &stream_index, &error)) {
    std::lock_guard<std::mutex> lock(s->mu);
    s->error = error;
    s->done = true;
    s->cv_produced.notify_all();
    return;
  }

  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  const size_t frame_bytes = size_t(s->width) * s->height * 3;

  Chunk current;
  current.data.resize(frame_bytes * s->chunk_frames);
  current.n_frames = 0;

  auto flush_chunk = [&]() {
    if (current.n_frames == 0) return;
    std::unique_lock<std::mutex> lock(s->mu);
    s->cv_consumed.wait(lock, [&] {
      return int(s->ready.size()) < s->depth || s->stop.load();
    });
    if (s->stop.load()) return;
    Chunk next;
    if (!s->free_list.empty()) {
      next = std::move(s->free_list.back());
      s->free_list.pop_back();
    } else {
      next.data.resize(frame_bytes * s->chunk_frames);
    }
    s->ready.push_back(std::move(current));
    current = std::move(next);
    current.n_frames = 0;
    s->cv_produced.notify_one();
  };

  auto fail = [&](const std::string& msg) {
    std::lock_guard<std::mutex> lock(s->mu);
    if (s->error.empty()) s->error = msg;
    s->stop.store(true);
  };

  int sws_src_format = AV_PIX_FMT_NONE;
  auto handle_frame = [&]() {
    // every chunk buffer (and the caller's) is sized for the probed
    // geometry: a mid-stream resolution change would overrun it, so it is
    // a hard decode error rather than a silent corruption
    if (frame->width != s->width || frame->height != s->height) {
      fail("mid-stream resolution change in " + s->path);
      return;
    }
    if (!sws || frame->format != sws_src_format) {
      if (sws) sws_freeContext(sws);
      sws = sws_getContext(frame->width, frame->height,
                           static_cast<AVPixelFormat>(frame->format),
                           s->width, s->height, AV_PIX_FMT_RGB24,
                           SWS_BILINEAR, nullptr, nullptr, nullptr);
      if (!sws) {
        fail("unsupported pixel format in " + s->path);
        return;
      }
      sws_src_format = frame->format;
    }
    uint8_t* dst = current.data.data() + frame_bytes * current.n_frames;
    uint8_t* dst_planes[4] = {dst, nullptr, nullptr, nullptr};
    int dst_stride[4] = {s->width * 3, 0, 0, 0};
    sws_scale(sws, frame->data, frame->linesize, 0, frame->height,
              dst_planes, dst_stride);
    current.n_frames++;
    if (current.n_frames == s->chunk_frames) flush_chunk();
  };

  while (!s->stop.load() && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == stream_index) {
      if (avcodec_send_packet(dec, pkt) == 0) {
        while (avcodec_receive_frame(dec, frame) == 0 && !s->stop.load()) {
          handle_frame();
        }
      }
    }
    av_packet_unref(pkt);
  }
  // drain the decoder
  avcodec_send_packet(dec, nullptr);
  while (!s->stop.load() && avcodec_receive_frame(dec, frame) == 0) {
    handle_frame();
  }
  flush_chunk();

  {
    std::lock_guard<std::mutex> lock(s->mu);
    s->done = true;
    s->cv_produced.notify_all();
  }

  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (sws) sws_freeContext(sws);
  avcodec_free_context(&dec);
  avformat_close_input(&fmt);
}

}  // namespace

extern "C" {

// Opens a streaming decoder. Returns an opaque handle or nullptr.
// Geometry is probed synchronously so the caller can size buffers.
void* fp_stream_open(const char* path, int chunk_frames, int depth) {
  auto* s = new Stream();
  s->path = path;
  s->chunk_frames = chunk_frames;
  s->depth = depth < 1 ? 1 : depth;

  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int idx = -1;
  std::string error;
  if (!open_video(s->path, &fmt, &dec, &idx, &error)) {
    delete s;
    return nullptr;
  }
  s->width = dec->width;
  s->height = dec->height;
  AVStream* st = fmt->streams[idx];
  s->approx_frames = st->nb_frames;
  if (st->avg_frame_rate.den > 0) {
    s->fps = av_q2d(st->avg_frame_rate);
  }
  avcodec_free_context(&dec);
  avformat_close_input(&fmt);

  s->worker = std::thread(decode_loop, s);
  return s;
}

int fp_stream_width(void* handle) { return static_cast<Stream*>(handle)->width; }
int fp_stream_height(void* handle) { return static_cast<Stream*>(handle)->height; }
double fp_stream_fps(void* handle) { return static_cast<Stream*>(handle)->fps; }
int64_t fp_stream_approx_frames(void* handle) {
  return static_cast<Stream*>(handle)->approx_frames;
}

// Blocks for the next chunk and copies it into `out` (caller-sized to
// chunk_frames * H * W * 3). Returns the number of frames copied, 0 at end
// of stream, -1 on decode error.
int fp_stream_next(void* handle, uint8_t* out) {
  auto* s = static_cast<Stream*>(handle);
  Chunk chunk;
  {
    std::unique_lock<std::mutex> lock(s->mu);
    s->cv_produced.wait(lock, [&] { return !s->ready.empty() || s->done; });
    if (!s->error.empty()) return -1;
    if (s->ready.empty()) return 0;  // done
    chunk = std::move(s->ready.front());
    s->ready.pop_front();
    // the ring slot is free as soon as the pop happens: wake the decoder
    // before the (multi-MB) copy below so it overlaps with the consumer
    s->cv_consumed.notify_one();
  }
  const size_t frame_bytes = size_t(s->width) * s->height * 3;
  std::memcpy(out, chunk.data.data(), frame_bytes * chunk.n_frames);
  int n = chunk.n_frames;
  {
    std::lock_guard<std::mutex> lock(s->mu);
    s->free_list.push_back(std::move(chunk));
  }
  return n;
}

const char* fp_stream_error(void* handle) {
  return static_cast<Stream*>(handle)->error.c_str();
}

void fp_stream_close(void* handle) {
  auto* s = static_cast<Stream*>(handle);
  s->stop.store(true);
  {
    std::lock_guard<std::mutex> lock(s->mu);
    s->cv_consumed.notify_all();
  }
  if (s->worker.joinable()) s->worker.join();
  delete s;
}

}  // extern "C"
