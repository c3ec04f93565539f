// robotlink: the framework's native telemetry/communication runtime.
//
// TPU-native replacement for the reference's ESP32 firmware layer:
//   * ESP_AP  (`ESP32/ESP_AP/src/main.cpp:94-127`): Wi-Fi softAP + TCP server
//     on port 80 accepting up to MAX_CLIENTS clients, broadcasting telemetry
//     and forwarding commands.
//   * the UART "DX:0" handshake with echo verification, RETRY_LIMIT retries
//     and a reply timeout (`ESP_AP/src/main.cpp:34-92`).
//   * ESP_HOST2 (`ESP32/ESP_HOST2/src/main.cpp:26-84`): station client with
//     static server address, periodic counter telemetry, reconnect-or-reset.
//
// Here the transport is TCP on the host (the robot side of the link), the
// framing is length-free newline-delimited ASCII like the firmware's
// println/readStringUntil, and the handshake semantics (send, await echo,
// retry N times, timeout) are preserved.  Exposed as a C ABI for ctypes.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC robotlink.cpp -o librobotlink.so -lpthread

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>
#include <fcntl.h>
#include <poll.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cerrno>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int MAX_CLIENTS = 2;      // `ESP_AP/src/main.cpp:16` WiFiClient clients[2]
constexpr int RETRY_LIMIT = 2;      // `ESP_AP/src/main.cpp:43` handshake retries
constexpr int REPLY_TIMEOUT_MS = 1000;  // `ESP_AP/src/main.cpp:60` 1 s echo wait

struct Server {
  int listen_fd = -1;
  std::atomic<bool> running{false};
  std::thread accept_thread;
  std::mutex mu;
  std::vector<int> clients;          // at most MAX_CLIENTS
  std::string rx_buffer;             // newline-delimited inbound lines
  std::mutex rx_mu;

  ~Server() { stop(); }

  bool start(uint16_t port) {
    listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (listen_fd < 0) return false;
    int one = 1;
    setsockopt(listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = htons(port);
    if (bind(listen_fd, (sockaddr*)&addr, sizeof(addr)) != 0) return false;
    if (listen(listen_fd, 4) != 0) return false;
    running = true;
    accept_thread = std::thread([this] { loop(); });
    return true;
  }

  void loop() {
    while (running) {
      pollfd pfds[1 + MAX_CLIENTS];
      pfds[0] = {listen_fd, POLLIN, 0};
      int n = 1;
      {
        std::lock_guard<std::mutex> lk(mu);
        for (int fd : clients) pfds[n++] = {fd, POLLIN, 0};
      }
      if (poll(pfds, n, 100) <= 0) continue;

      if (pfds[0].revents & POLLIN) {
        int fd = accept(listen_fd, nullptr, nullptr);
        if (fd >= 0) {
          std::lock_guard<std::mutex> lk(mu);
          if ((int)clients.size() < MAX_CLIENTS) {
            clients.push_back(fd);
          } else {
            ::close(fd);  // beyond capacity: refused, like the 2-slot firmware
          }
        }
      }
      for (int i = 1; i < n; i++) {
        if (!(pfds[i].revents & (POLLIN | POLLHUP))) continue;
        char buf[1024];
        ssize_t got = recv(pfds[i].fd, buf, sizeof(buf), MSG_DONTWAIT);
        if (got <= 0) {
          std::lock_guard<std::mutex> lk(mu);
          ::close(pfds[i].fd);
          clients.erase(std::remove(clients.begin(), clients.end(), pfds[i].fd), clients.end());
        } else {
          std::lock_guard<std::mutex> lk(rx_mu);
          rx_buffer.append(buf, got);
        }
      }
    }
  }

  int broadcast(const char* line) {
    std::string msg = std::string(line) + "\n";
    std::lock_guard<std::mutex> lk(mu);
    int sent = 0;
    for (int fd : clients) {
      if (send(fd, msg.data(), msg.size(), MSG_NOSIGNAL) == (ssize_t)msg.size()) sent++;
    }
    return sent;
  }

  // pop one complete line into out (returns length, or -1 when none buffered)
  int read_line(char* out, int cap) {
    std::lock_guard<std::mutex> lk(rx_mu);
    auto pos = rx_buffer.find('\n');
    if (pos == std::string::npos) return -1;
    int len = (int)std::min<size_t>(pos, cap - 1);
    memcpy(out, rx_buffer.data(), len);
    out[len] = 0;
    rx_buffer.erase(0, pos + 1);
    return len;
  }

  int client_count() {
    std::lock_guard<std::mutex> lk(mu);
    return (int)clients.size();
  }

  void stop() {
    if (!running.exchange(false)) return;
    if (accept_thread.joinable()) accept_thread.join();
    std::lock_guard<std::mutex> lk(mu);
    for (int fd : clients) ::close(fd);
    clients.clear();
    if (listen_fd >= 0) ::close(listen_fd);
    listen_fd = -1;
  }
};

struct Client {
  int fd = -1;

  bool connect_to(const char* host, uint16_t port, int timeout_ms) {
    fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return false;
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(port);
    inet_pton(AF_INET, host, &addr.sin_addr);
    // non-blocking connect with timeout (station retry loop does its own
    // restarts, `ESP_HOST2/src/main.cpp:35-52`)
    int flags = fcntl(fd, F_GETFL, 0);
    fcntl(fd, F_SETFL, flags | O_NONBLOCK);
    int rc = ::connect(fd, (sockaddr*)&addr, sizeof(addr));
    if (rc != 0 && errno == EINPROGRESS) {
      pollfd p{fd, POLLOUT, 0};
      if (poll(&p, 1, timeout_ms) <= 0) { close_(); return false; }
      int err = 0; socklen_t len = sizeof(err);
      getsockopt(fd, SOL_SOCKET, SO_ERROR, &err, &len);
      if (err != 0) { close_(); return false; }
    } else if (rc != 0) {
      close_();
      return false;
    }
    fcntl(fd, F_SETFL, flags);
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    return true;
  }

  bool send_line(const char* line) {
    if (fd < 0) return false;
    std::string msg = std::string(line) + "\n";
    return send(fd, msg.data(), msg.size(), MSG_NOSIGNAL) == (ssize_t)msg.size();
  }

  // blocking line read with timeout
  int read_line(char* out, int cap, int timeout_ms) {
    if (fd < 0) return -1;
    std::string buf;
    auto deadline = std::chrono::steady_clock::now() + std::chrono::milliseconds(timeout_ms);
    while (std::chrono::steady_clock::now() < deadline) {
      pollfd p{fd, POLLIN, 0};
      int remaining = (int)std::chrono::duration_cast<std::chrono::milliseconds>(
                          deadline - std::chrono::steady_clock::now()).count();
      if (poll(&p, 1, std::max(remaining, 0)) <= 0) break;
      char c;
      ssize_t got = recv(fd, &c, 1, 0);
      if (got <= 0) break;
      if (c == '\n') {
        int len = (int)std::min<size_t>(buf.size(), cap - 1);
        memcpy(out, buf.data(), len);
        out[len] = 0;
        return len;
      }
      buf.push_back(c);
    }
    return -1;
  }

  // the firmware's handshake: send `msg`, await exact echo within the
  // timeout, retry up to RETRY_LIMIT times (`ESP_AP/src/main.cpp:43-88`)
  int handshake(const char* msg) {
    for (int attempt = 0; attempt <= RETRY_LIMIT; attempt++) {
      if (!send_line(msg)) continue;
      char reply[256];
      if (read_line(reply, sizeof(reply), REPLY_TIMEOUT_MS) >= 0 &&
          strcmp(reply, msg) == 0) {
        return attempt;  // success: number of retries used
      }
    }
    return -1;
  }

  void close_() {
    if (fd >= 0) ::close(fd);
    fd = -1;
  }
};

}  // namespace

extern "C" {

void* rl_server_start(uint16_t port) {
  auto* s = new Server();
  if (!s->start(port)) { delete s; return nullptr; }
  return s;
}
int rl_server_broadcast(void* h, const char* line) { return ((Server*)h)->broadcast(line); }
int rl_server_read_line(void* h, char* out, int cap) { return ((Server*)h)->read_line(out, cap); }
int rl_server_client_count(void* h) { return ((Server*)h)->client_count(); }
void rl_server_stop(void* h) { auto* s = (Server*)h; s->stop(); delete s; }

void* rl_client_connect(const char* host, uint16_t port, int timeout_ms) {
  auto* c = new Client();
  if (!c->connect_to(host, port, timeout_ms)) { delete c; return nullptr; }
  return c;
}
int rl_client_send(void* h, const char* line) { return ((Client*)h)->send_line(line) ? 0 : -1; }
int rl_client_read_line(void* h, char* out, int cap, int timeout_ms) {
  return ((Client*)h)->read_line(out, cap, timeout_ms);
}
int rl_client_handshake(void* h, const char* msg) { return ((Client*)h)->handshake(msg); }
void rl_client_close(void* h) { auto* c = (Client*)h; c->close_(); delete c; }

}  // extern "C"
