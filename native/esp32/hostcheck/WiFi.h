// Minimal WiFi API surface for host-side syntax checking (see Arduino.h).
#pragma once
#include "Arduino.h"

#define WL_CONNECTED 3

class WiFiClient {
 public:
  explicit operator bool() const { return false; }
  bool connected() { return false; }
  bool connect(const char*, uint16_t) { return false; }
  int available() { return 0; }
  String readStringUntil(char) { return {}; }
  IPAddress remoteIP() { return {}; }
  template <typename T>
  void println(const T&) {}
  void stop() {}
};

class WiFiServer {
 public:
  explicit WiFiServer(uint16_t) {}
  void begin() {}
  bool hasClient() { return false; }
  WiFiClient available() { return {}; }
};

class WiFiClass {
 public:
  void softAP(const char*, const char*) {}
  IPAddress softAPIP() { return {}; }
  void begin(const char*, const char*) {}
  void config(IPAddress, IPAddress, IPAddress) {}
  int status() { return 0; }
  IPAddress localIP() { return {}; }
  String macAddress() { return {}; }
};
extern WiFiClass WiFi;
