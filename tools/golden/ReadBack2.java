import com.clearspring.analytics.stream.Counter;
import com.clearspring.analytics.stream.StreamSummary;
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.util.Base64;

// Interop read-back harness: each stdin line is base64 of a
// StreamSummary wire blob (produced by OUR codec); the REFERENCE
// deserializes it and reports capacity plus its own topK view.
public class ReadBack2 {
    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isBlank()) continue;
            StreamSummary<String> ss =
                    new StreamSummary<String>(Base64.getDecoder().decode(line.trim()));
            StringBuilder sb = new StringBuilder();
            sb.append(ss.getCapacity());
            for (Counter<String> c : ss.topK(ss.size())) {
                sb.append(',').append(c.getItem()).append(':')
                        .append(c.getCount()).append(':').append(c.getError());
            }
            System.out.println(sb);
        }
    }
}
