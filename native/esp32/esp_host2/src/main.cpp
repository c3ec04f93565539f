// ESP32 station client: joins the hub's access point and reports a
// MAC-tagged sensor line once a second over a short-lived TCP connection,
// mirroring the readings over UART2.
//
// Re-implements the behavior of the reference firmware
// (`ESP32/ESP_HOST2/src/main.cpp:1-84`):
//   * static IP configuration before joining "ESP32_AP";
//   * join with up to kJoinRetries 1 s-spaced attempts, then hard-reset the
//     chip (ESP.restart) and start over — the reconnect semantics the host
//     hub's client (`native/robotlink.cpp`) is tested against;
//   * each cycle: open TCP to the AP at 192.168.4.1:80, send ONE
//     newline-terminated status line ("ESP_2" tag + MAC + two counter
//     readings), close, bump the counters, sleep 1 s;
//   * a failed connect logs and retries after 1 s without resetting;
//   * the counter pair is also written to UART2 as "a,b\n" every cycle.

#include <Arduino.h>
#include <WiFi.h>

namespace {

constexpr char kApSsid[] = "ESP32_AP";
constexpr char kApPassword[] = "12345678";
constexpr char kHubIp[] = "192.168.4.1";
constexpr uint16_t kHubPort = 80;

constexpr int kUartRxPin = 16;
constexpr int kUartTxPin = 17;
constexpr long kUartBaud = 9600;

constexpr int kJoinRetries = 10;
constexpr unsigned long kCyclePeriodMs = 1000;

HardwareSerial& sensorLink = Serial2;

// Reported readings; the reference increments placeholders each cycle in
// lieu of real sensors — kept so the wire traffic matches.
int reading3 = 0;
int reading4 = 0;

void applyStaticIp() {
  IPAddress ip(172, 26, 179, 199);
  IPAddress gateway(172, 26, 183, 254);
  IPAddress subnet(255, 255, 248, 0);
  WiFi.config(ip, gateway, subnet);
}

void joinAccessPointOrReset() {
  WiFi.begin(kApSsid, kApPassword);
  Serial.print("joining ");
  Serial.println(kApSsid);
  for (int i = 0; i < kJoinRetries && WiFi.status() != WL_CONNECTED; i++) {
    Serial.print(".");
    delay(1000);
  }
  Serial.println();
  if (WiFi.status() != WL_CONNECTED) {
    Serial.println("join failed: restarting");
    delay(1000);
    ESP.restart();
  }
  Serial.print("joined, ip ");
  Serial.println(WiFi.localIP());
}

String statusLine() {
  return String("_______ESP_2:______Dia chi MAC: ") + WiFi.macAddress() +
         "           Cam bien 3: " + String(reading3) +
         "             Cam bien 4: " + String(reading4);
}

}  // namespace

void setup() {
  Serial.begin(kUartBaud);
  sensorLink.begin(kUartBaud, SERIAL_8N1, kUartRxPin, kUartTxPin);
  applyStaticIp();
  joinAccessPointOrReset();
}

void loop() {
  WiFiClient hub;
  if (!hub.connect(kHubIp, kHubPort)) {
    Serial.println("hub connect failed");
    delay(kCyclePeriodMs);
    return;
  }
  sensorLink.print(reading3);
  sensorLink.print(",");
  sensorLink.println(reading4);

  String line = statusLine();
  hub.println(line);
  Serial.println("sent: " + line);
  hub.stop();

  reading3++;
  reading4++;
  delay(kCyclePeriodMs);
}
